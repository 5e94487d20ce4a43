"""Role-based security — the ORole/OUser permission model, enforced at
query entry.

Reference: roles hold a CRUD bitmask per resource
(core:metadata/security/ORole.java — CREATE/READ/UPDATE/DELETE bits,
resource strings like ``database.class.<name>`` from
ODatabaseSecurityResources); the SQL executor checks READ on the target
class before running a SELECT (core:sql/OCommandExecutorSQLSelect.java:90,
158-165) and the write executors check their verb likewise. GRANT/REVOKE
(core:sql/OCommandExecutorSQLGrant/Revoke) mutate the role's bitmask.

Engine mapping: ``Engine.security`` stores role → resource → bits;
``Engine.set_role(name)`` selects the session identity (None = admin, the
reference's default admin user — everything allowed). Enforcement happens
in Engine.sql/command dispatch, before compilation, so a denied statement
costs no Spark work at all.
"""

from __future__ import annotations

from orientdb_spark.errors import OException


class OSecurityAccessException(OException):
    """Operation not allowed for the current role (reference:
    OSecurityAccessException, core:exception/)."""


# ORole.java permission bits
PERMISSION_BITS = {
    "create": 1,
    "read": 2,
    "update": 4,
    "delete": 8,
    "all": 15,
    "none": 0,
}


def _normalize_resource(resource: str) -> str:
    return resource.lower()


class SecurityManager:
    def __init__(self) -> None:
        # role (lower) -> resource (lower) -> bitmask
        self._roles: dict[str, dict[str, int]] = {}
        self.current_role: str | None = None  # None = admin

    # -- GRANT / REVOKE ----------------------------------------------------

    def grant(self, role: str, resource: str, permission: str) -> int:
        bit = PERMISSION_BITS.get(permission.lower())
        if bit is None:
            raise OSecurityAccessException(f"Unknown permission '{permission}'")
        res = self._roles.setdefault(role.lower(), {})
        key = _normalize_resource(resource)
        res[key] = res.get(key, 0) | bit
        return res[key]

    def revoke(self, role: str, resource: str, permission: str) -> int:
        bit = PERMISSION_BITS.get(permission.lower())
        if bit is None:
            raise OSecurityAccessException(f"Unknown permission '{permission}'")
        res = self._roles.setdefault(role.lower(), {})
        key = _normalize_resource(resource)
        res[key] = res.get(key, 0) & ~bit
        return res[key]

    # -- checks ------------------------------------------------------------

    def _bits_for(self, role: str, class_name: str | None) -> int:
        """Most-specific resource wins: database.class.<name> →
        database.class.* → database → * (the reference's fallback walk)."""
        res = self._roles.get(role.lower())
        if res is None:
            # undefined role: nothing granted
            return 0
        candidates = []
        if class_name:
            candidates.append(f"database.class.{class_name.lower()}")
        candidates += ["database.class.*", "database", "*"]
        for key in candidates:
            if key in res:
                return res[key]
        return 0

    def allowed(self, op: str, class_name: str | None) -> bool:
        if self.current_role is None:
            return True  # admin
        bit = PERMISSION_BITS[op]
        return (self._bits_for(self.current_role, class_name) & bit) == bit

    def check(self, op: str, class_name: str | None) -> None:
        if not self.allowed(op, class_name):
            target = f"database.class.{class_name}" if class_name else "database"
            raise OSecurityAccessException(
                f"User/role '{self.current_role}' has no permission to "
                f"{op.upper()} against the resource: {target}"
            )
