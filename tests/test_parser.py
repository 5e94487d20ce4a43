"""Parser unit tests — grammar coverage incl. the reference's negative
parse-error style (tests:database/auto/SQLSelectTest.java:500-512,
WrongQueryTest)."""

import pytest

from orientdb_spark import sqlast as A
from orientdb_spark.errors import OCommandSQLParsingException
from orientdb_spark.parser import parse


def test_bare_select():
    cmd = parse("select from Profile")
    assert isinstance(cmd, A.SelectCmd)
    assert cmd.projections == []
    assert cmd.target == A.ClassTarget("Profile", None)


def test_projections_alias_and_auto():
    cmd = parse("select name, surname as s, nick.toUpperCase() from Profile")
    assert len(cmd.projections) == 3
    assert cmd.projections[1].alias == "s"
    chain = cmd.projections[2].expr.parts
    assert isinstance(chain[-1], A.MethodPart) and chain[-1].name == "touppercase"


def test_where_tree():
    cmd = parse(
        "select from Profile where (name = 'Giuseppe' or nick like 'N%') and salary >= 100.5"
    )
    assert isinstance(cmd.where, A.And)
    assert isinstance(cmd.where.left, A.Or)


def test_rid_target_and_list():
    cmd = parse("select from 10:3")
    assert cmd.target == A.RidTarget([A.Rid(10, 3)])
    cmd = parse("select from [10:0, 10:1]")
    assert cmd.target == A.RidTarget([A.Rid(10, 0), A.Rid(10, 1)])


def test_cluster_target():
    cmd = parse("select from cluster:animal")
    assert cmd.target == A.ClusterTarget("animal")


def test_order_range_limit():
    cmd = parse("select from Animal order by name desc, race range 11:5, 11:9 limit 7")
    assert cmd.order_by[0].ascending is False
    assert cmd.order_by[1].ascending is True
    assert cmd.range_ == (A.Rid(11, 5), A.Rid(11, 9))
    assert cmd.limit == 7


def test_in_list_and_contains_condition():
    cmd = parse("select from Animal where name in ['a', 'b'] and races contains (name = 'X')")
    conj = cmd.where
    assert isinstance(conj.left, A.BinCond) and conj.left.op == "in"
    assert isinstance(conj.right, A.BinCond) and conj.right.op == "contains"
    assert isinstance(conj.right.right, A.BinCond)


def test_traverse():
    cmd = parse(
        "select from Profile where followers traverse(0, 3) (nick = 'x')"
    )
    t = cmd.where
    assert t.op == "traverse"
    assert t.op_params == [0, 3]


def test_any_all():
    cmd = parse("select from Profile where any() like 'N%' and all() is not null")
    assert isinstance(cmd.where.left.left, A.AnyField)
    assert isinstance(cmd.where.right, A.IsNull) and cmd.where.right.negated


def test_flatten():
    cmd = parse("select flatten(out) from OGraphVertex")
    assert cmd.flatten == "out"


def test_group_by_having():
    cmd = parse(
        "select l_returnflag, sum(l_quantity) as q from lineitem "
        "group by l_returnflag having sum(l_quantity) > 10 order by q limit 2"
    )
    assert cmd.group_by and cmd.having is not None


def test_insert():
    cmd = parse("insert into Profile (name, salary, tags) values ('Luca', 100.3, ['a','b'])")
    assert cmd.fields == ["name", "salary", "tags"]
    assert isinstance(cmd.values[2], A.ListLit)


def test_update_clauses():
    cmd = parse(
        "update Profile set nick = 'x', n = 2 add tags = 'y' remove old where name = 'z'"
    )
    assert len(cmd.sets) == 2 and len(cmd.adds) == 1 and len(cmd.removes) == 1
    assert cmd.where is not None


def test_create_statements():
    assert isinstance(parse("create class Account"), A.CreateClassCmd)
    c = parse("create property Account.tags embeddedlist string")
    assert c.type_name == "embeddedlist" and c.linked == "string"
    i = parse("create index Profile.nick unique")
    assert i.index_type == "unique"
    l = parse("create link city from Address.city_name to City.name inverse")
    assert l.inverse is True


def test_parse_errors():
    for bad in [
        "select from",
        "select where from X",
        "banana from X",
        "select from X where",
        "select from X limit 'a'",
        "insert into X (a, b) values (1)",
    ]:
        with pytest.raises(OCommandSQLParsingException):
            parse(bad)
