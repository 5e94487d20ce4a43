"""Engine exceptions, mirroring the reference's error surface
(OCommandSQLParsingException, OQueryParsingException, OSchemaException,
OConcurrentModificationException — core:exception/, core:sql/)."""

from __future__ import annotations


class OException(Exception):
    pass


class OCommandSQLParsingException(OException):
    """Bad SQL text (reference raises with position info; we include the
    offset when known — core:sql/OSQLHelper.java / OSQLFilter.java)."""

    def __init__(self, message: str, text: str | None = None, position: int | None = None):
        if text is not None and position is not None:
            message = f"{message}. Use: near position {position}: {text[max(0, position - 5):position + 30]!r}"
        super().__init__(message)
        self.text = text
        self.position = position


class OQueryParsingException(OCommandSQLParsingException):
    pass


class OSchemaException(OException):
    pass


class OCommandExecutionException(OException):
    pass


class OConcurrentModificationException(OException):
    """Optimistic-MVCC version conflict (core:tx/OTransactionOptimistic.java:22-45)."""


class OValidationException(OException):
    """Schema constraint violated on save (mandatory/notNull/min/max —
    ORecordSchemaAwareAbstract.validate(), core:record/)."""


class OIndexException(OException):
    """Index constraint violated — a write would leave duplicate keys in a
    UNIQUE property index (core:metadata/schema/OProperty.java:257 index
    types; reference test IndexTest expects the duplicate save to fail)."""
