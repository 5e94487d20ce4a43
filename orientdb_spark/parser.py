"""Recursive-descent parser for the SQL dialect.

Grammar mirrors the reference's hand-rolled parse:
- statement dispatch by leading keyword (core:sql/OCommandExecutorSQLDelegate.java:36-67)
- SELECT clause layout (core:sql/OCommandExecutorSQLSelect.java:89-149):
  projections (:435-500), target forms class / cluster:<n> / RID / [RIDs]
  (core:sql/filter/OSQLFilter.java:96-165), WHERE condition tree (:167-302),
  ORDER BY (:252-301), RANGE (:303-343), LIMIT (:345-356)
- WHERE operator registry (core:sql/OSQLHelper.java:63-68): and or not = <>
  < <= > >= like is in matches contains containsall containskey
  containsvalue containstext traverse(...)
- typed literal parsing (core:sql/OSQLHelper.java:112-164): string, int,
  float, bool, null, RID, [collection]

Extensions beyond the reference (SURVEY §2.5/2.6 'ours to build on Spark'):
SELECT DISTINCT, GROUP BY/HAVING, BETWEEN, NOT IN/NOT LIKE, arithmetic in
projections, subquery target ``FROM (select …)``.
"""

from __future__ import annotations

from orientdb_spark import sqlast as A
from orientdb_spark.errors import OCommandSQLParsingException
from orientdb_spark.lexer import ATTR, EOF, IDENT, NUMBER, PARAM, PUNCT, RID, STRING, Token, tokenize

# binary condition operators, longest keyword first where prefixes collide
_WORD_OPS = {
    "like",
    "in",
    "matches",
    "containsall",
    "containskey",
    "containsvalue",
    "containstext",
    "contains",
    "traverse",
    "between",
    "is",
}
_PUNCT_OPS = {"=", "<>", "!=", "<", "<=", ">", ">="}

_METHOD_NAMES = {
    # core:sql/filter/OSQLFilterFieldOperator.java:25-31 registry
    "touppercase", "tolowercase", "trim", "left", "right", "substring",
    "charat", "indexof", "format", "length", "size", "append", "prefix",
    "asstring", "asinteger", "asfloat", "asboolean", "asdate", "asdatetime",
    "asdecimal", "aslong", "keys", "values", "field",
}


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0
        self._nparams = 0

    # -- token helpers ------------------------------------------------------

    def peek(self, ahead: int = 0) -> Token:
        j = min(self.i + ahead, len(self.toks) - 1)
        return self.toks[j]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != EOF:
            self.i += 1
        return t

    def accept_kw(self, *words: str) -> bool:
        if self.peek().is_kw(*words):
            self.next()
            return True
        return False

    def expect_kw(self, word: str) -> None:
        if not self.accept_kw(word):
            self.error(f"Expected keyword '{word.upper()}'")

    def accept_punct(self, p: str) -> bool:
        t = self.peek()
        if t.kind == PUNCT and t.value == p:
            self.next()
            return True
        return False

    def expect_punct(self, p: str) -> None:
        if not self.accept_punct(p):
            self.error(f"Expected '{p}'")

    def expect_ident(self) -> str:
        t = self.next()
        if t.kind != IDENT:
            self.error("Expected identifier", t)
        return str(t.value)

    def error(self, msg: str, tok: Token | None = None):
        tok = tok or self.peek()
        raise OCommandSQLParsingException(msg, self.text, tok.pos)

    # -- statements ----------------------------------------------------------

    def parse_command(self):
        t = self.peek()
        if t.kind != IDENT:
            self.error("Expected a command keyword")
        kw = str(t.value).lower()
        if kw == "select":
            return self.parse_select()
        if kw == "insert":
            return self.parse_insert()
        if kw == "update":
            return self.parse_update()
        if kw == "delete":
            return self.parse_delete()
        if kw == "create":
            return self.parse_create()
        if kw == "remove":
            return self.parse_remove()
        if kw == "truncate":
            self.next()
            self.expect_kw("class")
            return A.TruncateCmd(self.expect_ident())
        if kw in ("grant", "revoke"):
            return self.parse_grant(kw == "revoke")
        self.error(f"Unknown command '{kw}'")

    # -- SELECT ---------------------------------------------------------------

    def parse_select(self) -> A.SelectCmd:
        self.expect_kw("select")
        distinct = self.accept_kw("distinct")
        projections: list[A.Projection] = []
        flatten: str | None = None
        if not self.peek().is_kw("from"):
            # projection list; bare `select from X` means identity (:447-448)
            if self.accept_punct("*"):
                pass
            else:
                while True:
                    if self.peek().is_kw("flatten"):
                        # FLATTEN(field) replaces the result set (:481-491)
                        self.next()
                        self.expect_punct("(")
                        flatten = self.expect_ident()
                        self.expect_punct(")")
                    else:
                        expr = self.parse_expr()
                        alias = None
                        if self.accept_kw("as"):
                            at = self.peek()
                            if at.kind == NUMBER:
                                # numeric alias → field named "1"
                                # (SQLSelectProjectionsTest.java:144-150:
                                # `name.append('!') as 1` reads back via
                                # d.field("1"))
                                self.next()
                                alias = str(int(at.value))
                            else:
                                alias = self.expect_ident()
                        projections.append(A.Projection(expr, alias))
                    if not self.accept_punct(","):
                        break
        self.expect_kw("from")
        target = self.parse_target()

        # reference quirk: OCommandExecutorSQLSelect locates each clause by
        # an uppercase indexOf scan (OCommandExecutorSQLSelect.java:112-116,
        # :443), so any text between the target and the first recognized
        # clause is silently ignored — SQLDeleteTest.java:46 runs
        # `select from Profile set sex = 'male' where salary > 100` and
        # expects the WHERE to apply as if the SET weren't there.
        while True:
            t = self.peek()
            if t.kind == EOF or (
                t.kind == IDENT
                and t.is_kw("where", "group", "order", "range", "limit", "having")
            ):
                break
            self.next()

        where = None
        if self.accept_kw("where"):
            where = self.parse_or()
        group_by = None
        having = None
        if self.accept_kw("group"):
            self.expect_kw("by")
            group_by = [self.parse_expr()]
            while self.accept_punct(","):
                group_by.append(self.parse_expr())
            if self.accept_kw("having"):
                having = self.parse_or()
        order_by = None
        if self.accept_kw("order"):
            self.expect_kw("by")
            order_by = []
            while True:
                e = self.parse_expr()
                asc = True
                if self.accept_kw("desc"):
                    asc = False
                else:
                    self.accept_kw("asc")
                order_by.append(A.OrderItem(e, asc))
                if not self.accept_punct(","):
                    break
        range_ = None
        if self.accept_kw("range"):
            lo = self._expect_rid()
            hi = None
            if self.accept_punct(","):
                hi = self._expect_rid()
            range_ = (lo, hi)
        limit = None
        if self.accept_kw("limit"):
            t = self.next()
            if t.kind != NUMBER:
                self.error("Expected number after LIMIT", t)
            limit = int(t.value)
        if self.peek().kind != EOF:
            self.error("Unexpected trailing input")
        return A.SelectCmd(
            projections=projections,
            target=target,
            where=where,
            group_by=group_by,
            having=having,
            order_by=order_by,
            limit=limit,
            range_=range_,
            distinct=distinct,
            flatten=flatten,
        )

    def _expect_rid(self) -> A.Rid:
        t = self.next()
        if t.kind != RID:
            self.error("Expected RID (<cluster>:<position>)", t)
        c, p = t.value
        return A.Rid(c, p)

    def parse_target(self):
        t = self.peek()
        if t.kind == RID:
            self.next()
            c, p = t.value
            return A.RidTarget([A.Rid(c, p)])
        if t.kind == PUNCT and t.value == "[":
            self.next()
            rids = [self._expect_rid()]
            while self.accept_punct(","):
                rids.append(self._expect_rid())
            self.expect_punct("]")
            return A.RidTarget(rids)
        if t.kind == PUNCT and t.value == "(":
            self.next()
            sub = self.parse_select_nested()
            self.expect_punct(")")
            return sub
        if t.is_kw("cluster"):
            # cluster:<name> (OSQLFilter.java:141-145)
            self.next()
            self.expect_punct(":")
            return A.ClusterTarget(self.expect_ident())
        name = self.expect_ident()
        alias = None
        nt = self.peek()
        if nt.kind == IDENT and not nt.is_kw(
            "where", "order", "limit", "range", "group", "having"
        ):
            alias = self.expect_ident()
        return A.ClassTarget(name, alias)

    def parse_select_nested(self) -> A.SelectCmd:
        """Subquery target — parse a full select that stops at the closing paren."""
        start = self.i
        depth = 0
        j = self.i
        while True:
            t = self.toks[j]
            if t.kind == EOF:
                self.error("Unterminated subquery")
            if t.kind == PUNCT and t.value == "(":
                depth += 1
            elif t.kind == PUNCT and t.value == ")":
                if depth == 0:
                    break
                depth -= 1
            j += 1
        sub_tokens = self.toks[start:j] + [Token(EOF, None, self.toks[j].pos)]
        sub = Parser.__new__(Parser)
        sub.text = self.text
        sub.toks = sub_tokens
        sub.i = 0
        sub._nparams = self._nparams
        cmd = sub.parse_select()
        self._nparams = sub._nparams
        self.i = j
        return cmd

    # -- conditions -------------------------------------------------------------

    def parse_or(self) -> A.Expr:
        left = self.parse_and()
        while self.accept_kw("or"):
            left = A.Or(left, self.parse_and())
        return left

    def parse_and(self) -> A.Expr:
        left = self.parse_not()
        while self.accept_kw("and"):
            left = A.And(left, self.parse_not())
        return left

    def parse_not(self) -> A.Expr:
        if self.accept_kw("not"):
            return A.Not(self.parse_not())
        return self.parse_condition()

    def parse_condition(self) -> A.Expr:
        left = self.parse_expr()
        t = self.peek()
        # punctuation comparison ops
        if t.kind == PUNCT and t.value in _PUNCT_OPS:
            self.next()
            op = "<>" if t.value == "!=" else str(t.value)
            right = self.parse_expr()
            return A.BinCond(op, left, right)
        if t.kind == IDENT:
            kw = str(t.value).lower()
            negated = False
            if kw == "not" and self.peek(1).is_kw("in", "like", "between"):
                self.next()
                t = self.peek()
                kw = str(t.value).lower()
                negated = True
            if kw == "is":
                self.next()
                neg = self.accept_kw("not")
                self.expect_kw("null")
                return A.IsNull(left, negated=neg)
            if kw == "between":
                self.next()
                low = self.parse_expr()
                self.expect_kw("and")
                high = self.parse_expr()
                return A.Between(left, low, high, negated=negated)
            if kw == "traverse":
                # item TRAVERSE(start,end[,fields]) (condition)
                # core:sql/operator/OQueryOperatorTraverse.java:160-176
                self.next()
                params: list[object] = []
                if self.accept_punct("("):
                    while not self.accept_punct(")"):
                        pt = self.next()
                        if pt.kind == NUMBER:
                            params.append(int(pt.value))
                        elif pt.kind == STRING:
                            params.append(str(pt.value))
                        elif pt.kind == PUNCT and pt.value == "-":
                            nt = self.next()
                            params.append(-int(nt.value))
                        elif pt.kind == PUNCT and pt.value == ",":
                            continue
                        elif pt.kind == IDENT and pt.value.lower() == "any":
                            # bare any() field spec = all fields, the
                            # reference default (OQueryOperatorTraverse.
                            # java:167 seeds fields with "any()"; test
                            # SQLSelectTest.java:278 passes it explicitly)
                            self.expect_punct("(")
                            self.expect_punct(")")
                            params.append("any()")
                        else:
                            self.error("Bad TRAVERSE parameter", pt)
                self.expect_punct("(")
                inner = self.parse_or()
                self.expect_punct(")")
                return A.BinCond("traverse", left, inner, op_params=params)
            if kw in ("contains", "containsall"):
                self.next()
                if self.accept_punct("("):
                    inner = self.parse_or()
                    self.expect_punct(")")
                    return A.BinCond(kw, left, inner)
                right = self.parse_expr()
                return A.BinCond(kw, left, right)
            if kw in _WORD_OPS:
                self.next()
                right = self.parse_expr()
                return A.BinCond(kw, left, right, negated=negated)
            # user-registered operators (OSQLHelper.registerOperator parity)
            from orientdb_spark.operators import custom_operator

            if custom_operator(kw) is not None:
                self.next()
                right = self.parse_expr()
                return A.BinCond(kw, left, right, negated=negated)
        return left  # bare boolean expression

    # -- value expressions ---------------------------------------------------

    def parse_expr(self) -> A.Expr:
        left = self.parse_term()
        while True:
            t = self.peek()
            if t.kind == PUNCT and t.value in ("+", "-"):
                self.next()
                left = A.Arith(str(t.value), left, self.parse_term())
            else:
                return left

    def parse_term(self) -> A.Expr:
        left = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind == PUNCT and t.value in ("*", "/", "%"):
                self.next()
                left = A.Arith(str(t.value), left, self.parse_unary())
            else:
                return left

    def parse_unary(self) -> A.Expr:
        if self.accept_punct("-"):
            operand = self.parse_unary()
            if isinstance(operand, A.Lit) and isinstance(operand.value, (int, float)):
                return A.Lit(-operand.value)
            return A.Neg(operand)
        return self.parse_primary()

    def parse_primary(self) -> A.Expr:
        t = self.peek()
        if t.kind == PUNCT and t.value == "(":
            self.next()
            inner = self.parse_or()
            self.expect_punct(")")
            return inner
        if t.kind == PUNCT and t.value == "[":
            self.next()
            items: list[A.Expr] = []
            if not self.accept_punct("]"):
                items.append(self.parse_expr())
                while self.accept_punct(","):
                    items.append(self.parse_expr())
                self.expect_punct("]")
            return A.ListLit(items)
        if t.kind == PUNCT and t.value == "*":
            self.next()
            return A.Star()
        if t.kind == NUMBER:
            self.next()
            return A.Lit(t.value)
        if t.kind == STRING:
            self.next()
            return A.Lit(str(t.value))
        if t.kind == RID:
            self.next()
            c, p = t.value
            return A.Rid(c, p)
        if t.kind == PARAM:
            self.next()
            idx = self._nparams
            self._nparams += 1
            return A.Param(idx)
        if t.kind == ATTR:
            self.next()
            return A.Attr(str(t.value), chain=self._parse_chain(allow_fields=True))
        if t.kind == IDENT:
            word = str(t.value)
            low = word.lower()
            if low in ("where", "from", "select", "order", "group", "having", "limit", "range"):
                self.error(f"Unexpected keyword '{word}' in expression", t)
            if low == "null":
                self.next()
                return A.Lit(None)
            if low in ("true", "false"):
                self.next()
                return A.Lit(low == "true")
            if low == "column" and self._is_call():
                self.next()
                self.expect_punct("(")
                it = self.next()
                if it.kind != NUMBER:
                    self.error("column() takes an integer index", it)
                self.expect_punct(")")
                return A.ColIdx(int(it.value), chain=self._parse_chain())
            if low == "any" and self._is_call():
                self.next()
                self.expect_punct("(")
                self.expect_punct(")")
                return A.AnyField(chain=self._parse_chain())
            if low == "all" and self._is_call():
                self.next()
                self.expect_punct("(")
                self.expect_punct(")")
                return A.AllFields(chain=self._parse_chain())
            if self._is_call():
                self.next()
                self.expect_punct("(")
                distinct = False
                args: list[A.Expr] = []
                if not self.accept_punct(")"):
                    if self.accept_kw("distinct"):
                        distinct = True
                    args.append(self.parse_expr())
                    while self.accept_punct(","):
                        args.append(self.parse_expr())
                    self.expect_punct(")")
                return A.Func(low, args, distinct=distinct, chain=self._parse_chain())
            # plain field path
            self.next()
            parts: list[A.FieldPart | A.MethodPart] = [A.FieldPart(word)]
            parts.extend(self._parse_chain(allow_fields=True))
            return A.FieldPath(parts)
        self.error("Unexpected token in expression", t)

    def _is_call(self) -> bool:
        nt = self.peek(1)
        return nt.kind == PUNCT and nt.value == "("

    def _parse_chain(self, allow_fields: bool = False) -> list[A.FieldPart | A.MethodPart]:
        """Parse `.method(args)` / `.field` continuations
        (core:sql/filter/OSQLFilterItemAbstract.java:48-118)."""
        parts: list[A.FieldPart | A.MethodPart] = []
        while self.peek().kind == PUNCT and self.peek().value == ".":
            nt = self.peek(1)
            if nt.kind != IDENT:
                break
            name = str(nt.value)
            after = self.peek(2)
            is_call = after.kind == PUNCT and after.value == "("
            if is_call:
                self.next()  # .
                self.next()  # name
                self.next()  # (
                args: list[A.Expr] = []
                if not self.accept_punct(")"):
                    args.append(self.parse_expr())
                    while self.accept_punct(","):
                        args.append(self.parse_expr())
                    self.expect_punct(")")
                parts.append(A.MethodPart(name.lower(), args))
            elif allow_fields:
                self.next()
                self.next()
                parts.append(A.FieldPart(name))
            else:
                break
        return parts

    # -- DML / DDL ---------------------------------------------------------------

    def parse_insert(self) -> A.InsertCmd:
        self.expect_kw("insert")
        self.expect_kw("into")
        cls = self.expect_ident()
        self.expect_punct("(")
        fields = [self.expect_ident()]
        while self.accept_punct(","):
            fields.append(self.expect_ident())
        self.expect_punct(")")
        self.expect_kw("values")
        self.expect_punct("(")
        values = [self.parse_expr()]
        while self.accept_punct(","):
            values.append(self.parse_expr())
        self.expect_punct(")")
        if len(fields) != len(values):
            self.error("INSERT fields/values arity mismatch")
        return A.InsertCmd(cls, fields, values)

    def parse_update(self) -> A.UpdateCmd:
        self.expect_kw("update")
        cls = self.expect_ident()
        sets: list[tuple[str, A.Expr]] = []
        adds: list[tuple[str, A.Expr]] = []
        puts: list[tuple[str, A.Expr, A.Expr]] = []
        removes: list[tuple[str, A.Expr | None]] = []
        while True:
            if self.accept_kw("set"):
                while True:
                    f = self.expect_ident()
                    self.expect_punct("=")
                    sets.append((f, self.parse_expr()))
                    if not self.accept_punct(","):
                        break
            elif self.accept_kw("add"):
                while True:
                    f = self.expect_ident()
                    self.expect_punct("=")
                    adds.append((f, self.parse_expr()))
                    if not self.accept_punct(","):
                        break
            elif self.accept_kw("put"):
                while True:
                    f = self.expect_ident()
                    self.expect_punct("=")
                    k = self.parse_expr()
                    self.expect_punct(",")
                    v = self.parse_expr()
                    puts.append((f, k, v))
                    if not self.accept_punct(","):
                        break
            elif self.accept_kw("remove"):
                while True:
                    f = self.expect_ident()
                    val: A.Expr | None = None
                    if self.accept_punct("="):
                        val = self.parse_expr()
                    removes.append((f, val))
                    if not self.accept_punct(","):
                        break
            else:
                break
        if not (sets or adds or puts or removes):
            # UPDATE without any mutation clause is a parse error
            # (OCommandExecutorSQLUpdate requires SET/ADD/PUT/REMOVE)
            self.error("Expected keyword 'SET'", self.peek())
        where = self.parse_or() if self.accept_kw("where") else None
        return A.UpdateCmd(cls, sets, adds, puts, removes, where)

    def parse_delete(self) -> A.DeleteCmd:
        self.expect_kw("delete")
        self.expect_kw("from")
        cls = self.expect_ident()
        where = self.parse_or() if self.accept_kw("where") else None
        return A.DeleteCmd(cls, where)

    def parse_create(self):
        self.expect_kw("create")
        if self.accept_kw("class"):
            name = self.expect_ident()
            sup = None
            if self.accept_kw("extends"):
                sup = self.expect_ident()
            return A.CreateClassCmd(name, sup)
        if self.accept_kw("property"):
            cls = self.expect_ident()
            self.expect_punct(".")
            prop = self.expect_ident()
            type_name = self.expect_ident()
            linked = None
            if self.peek().kind == IDENT:
                linked = self.expect_ident()
            return A.CreatePropertyCmd(cls, prop, type_name.lower(), linked)
        if self.accept_kw("index"):
            cls = self.expect_ident()
            self.expect_punct(".")
            prop = self.expect_ident()
            itype = "notunique"
            if self.peek().kind == IDENT:
                itype = self.expect_ident().lower()
            return A.CreateIndexCmd(cls, prop, itype)
        if self.accept_kw("link"):
            link_name = self.expect_ident()
            self.expect_kw("from")
            fc = self.expect_ident()
            self.expect_punct(".")
            ff = self.expect_ident()
            self.expect_kw("to")
            tc = self.expect_ident()
            self.expect_punct(".")
            tf = self.expect_ident()
            inverse = self.accept_kw("inverse")
            return A.CreateLinkCmd(link_name, fc, ff, tc, tf, inverse)
        self.error("Unknown CREATE statement")

    def parse_remove(self):
        self.expect_kw("remove")
        if self.accept_kw("property"):
            cls = self.expect_ident()
            self.expect_punct(".")
            return A.RemovePropertyCmd(cls, self.expect_ident())
        if self.accept_kw("index"):
            cls = self.expect_ident()
            self.expect_punct(".")
            return A.RemoveIndexCmd(cls, self.expect_ident())
        self.error("Unknown REMOVE statement")

    def parse_grant(self, revoke: bool) -> A.GrantCmd:
        # GRANT <perm> ON <resource> TO <role> /
        # REVOKE <perm> ON <resource> FROM <role>
        # (core:sql/OCommandExecutorSQLGrant/Revoke); resource parts may be
        # the '*' wildcard (database.class.*)
        self.next()  # grant/revoke

        def resource_part() -> str:
            if self.accept_punct("*"):
                return "*"
            return self.expect_ident()

        perm = self.expect_ident()
        self.expect_kw("on")
        parts = [resource_part()]
        while self.accept_punct("."):
            parts.append(resource_part())
        self.expect_kw("from" if revoke else "to")
        role = self.expect_ident()
        return A.GrantCmd(perm, ".".join(parts), role, revoke=revoke)


def parse(text: str):
    return Parser(text).parse_command()
