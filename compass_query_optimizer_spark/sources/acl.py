"""Users / roles / grants DDL (catalog-level access control).

The reference keeps users, roles, and object privileges in its SQLite
catalog and checks them before executing each statement
(Parser/ParserNode.h:876-1137: CreateUserStmt / AlterUserStmt /
DropUserStmt / CreateRoleStmt / DropRoleStmt / GrantRoleStmt /
RevokeRoleStmt / GrantPrivilegesStmt / RevokePrivilegesStmt;
Catalog/SysCatalog.cpp checkPrivileges). Spark in local/session mode has
no user catalog — cluster deployments delegate authn/authz to Ranger /
Unity / IAM — so the Spark-first parity is a driver-side catalog object
that the engine's entry points consult: the same privilege model, enforced
before a plan is submitted, with the actual data path untouched (no
per-row cost anywhere near the 100 TB scan).

Model (mirrors the reference's AccessPrivileges):
- users have a salted password digest and a superuser flag;
- roles are grantees too (nested roles resolve transitively);
- privileges are (grantee, privilege, object) triples, object "*" = all;
- check = union of the user's direct grants and every role reachable
  from it.
"""

from __future__ import annotations

import hashlib
import os
import threading
from dataclasses import dataclass, field

PRIVILEGES = frozenset(
    {"SELECT", "INSERT", "UPDATE", "DELETE", "CREATE", "DROP", "ALTER", "VIEW"}
)
ALL_OBJECTS = "*"


class AccessDenied(PermissionError):
    pass


def _digest(password: str, salt: str) -> str:
    return hashlib.sha256(f"{salt}:{password}".encode()).hexdigest()


@dataclass
class _User:
    name: str
    salt: str
    pw_digest: str
    is_super: bool = False
    roles: set[str] = field(default_factory=set)


@dataclass
class _Role:
    name: str
    roles: set[str] = field(default_factory=set)  # nested role grants


class AccessControl:
    """Driver-side user/role/privilege catalog with reference semantics."""

    def __init__(self) -> None:
        self._lock = threading.RLock()
        self._users: dict[str, _User] = {}
        self._roles: dict[str, _Role] = {}
        # (grantee, privilege) -> set of objects
        self._grants: dict[tuple[str, str], set[str]] = {}

    # -- users (CreateUserStmt / AlterUserStmt / DropUserStmt) ------------
    def create_user(
        self, name: str, password: str, is_super: bool = False
    ) -> None:
        with self._lock:
            if name in self._users:
                raise ValueError(f"user {name} already exists")
            salt = os.urandom(8).hex()
            self._users[name] = _User(name, salt, _digest(password, salt), is_super)

    def alter_user(
        self,
        name: str,
        password: str | None = None,
        is_super: bool | None = None,
    ) -> None:
        with self._lock:
            u = self._user(name)
            if password is not None:
                u.salt = os.urandom(8).hex()
                u.pw_digest = _digest(password, u.salt)
            if is_super is not None:
                u.is_super = is_super

    def drop_user(self, name: str) -> None:
        with self._lock:
            self._user(name)
            del self._users[name]
            self._purge_grantee(name)

    def authenticate(self, name: str, password: str) -> bool:
        with self._lock:
            u = self._users.get(name)
            return u is not None and _digest(password, u.salt) == u.pw_digest

    # -- roles (CreateRoleStmt / DropRoleStmt / Grant/RevokeRoleStmt) -----
    def create_role(self, name: str) -> None:
        with self._lock:
            if name in self._roles or name in self._users:
                raise ValueError(f"role {name} already exists")
            self._roles[name] = _Role(name)

    def drop_role(self, name: str) -> None:
        with self._lock:
            self._role(name)
            del self._roles[name]
            self._purge_grantee(name)
            for u in self._users.values():
                u.roles.discard(name)
            for r in self._roles.values():
                r.roles.discard(name)

    def grant_role(self, role: str, grantee: str) -> None:
        with self._lock:
            self._role(role)
            if grantee in self._users:
                self._users[grantee].roles.add(role)
            else:
                g = self._role(grantee)
                # reject cycles: role membership must stay a DAG
                if role == grantee or grantee in self._reachable_roles({role}):
                    raise ValueError(f"role cycle: {role} -> {grantee}")
                g.roles.add(role)

    def revoke_role(self, role: str, grantee: str) -> None:
        with self._lock:
            if grantee in self._users:
                self._users[grantee].roles.discard(role)
            else:
                self._role(grantee).roles.discard(role)

    # -- privileges (Grant/RevokePrivilegesStmt) --------------------------
    def grant_privilege(self, privilege: str, obj: str, grantee: str) -> None:
        with self._lock:
            self._check_priv_name(privilege)
            self._grantee(grantee)
            self._grants.setdefault((grantee, privilege), set()).add(obj)

    def revoke_privilege(self, privilege: str, obj: str, grantee: str) -> None:
        with self._lock:
            self._check_priv_name(privilege)
            objs = self._grants.get((grantee, privilege))
            if objs:
                objs.discard(obj)

    # -- checks (SysCatalog checkPrivileges) ------------------------------
    def has_privilege(self, user: str, privilege: str, obj: str) -> bool:
        with self._lock:
            u = self._user(user)
            if u.is_super:
                return True
            for grantee in {user} | self._reachable_roles(u.roles):
                objs = self._grants.get((grantee, privilege), ())
                if obj in objs or ALL_OBJECTS in objs:
                    return True
            return False

    def show_privileges(self, grantee: str) -> list[tuple[str, str, str]]:
        """ShowPrivilegesStmt (ParserNode.h:1085): the grantee's effective
        privileges as sorted (source_grantee, privilege, object) rows —
        direct grants plus everything inherited through reachable roles."""
        with self._lock:
            self._grantee(grantee)
            sources = {grantee}
            if grantee in self._users:
                sources |= self._reachable_roles(self._users[grantee].roles)
            else:
                sources |= self._reachable_roles(self._roles[grantee].roles)
            out = [
                (g, priv, obj)
                for (g, priv), objs in self._grants.items()
                if g in sources
                for obj in objs
            ]
            return sorted(out)

    def authorize(self, user: str, privilege: str, obj: str) -> None:
        """Raise AccessDenied unless ``user`` holds ``privilege`` on
        ``obj`` — call before submitting the plan, never inside it."""
        if not self.has_privilege(user, privilege, obj):
            raise AccessDenied(f"{user} lacks {privilege} on {obj}")

    # -- internals --------------------------------------------------------
    def _user(self, name: str) -> _User:
        if name not in self._users:
            raise KeyError(f"no such user {name}")
        return self._users[name]

    def _role(self, name: str) -> _Role:
        if name not in self._roles:
            raise KeyError(f"no such role {name}")
        return self._roles[name]

    def _grantee(self, name: str) -> None:
        if name not in self._users and name not in self._roles:
            raise KeyError(f"no such user or role {name}")

    def _reachable_roles(self, start: set[str]) -> set[str]:
        seen: set[str] = set()
        stack = list(start)
        while stack:
            r = stack.pop()
            if r in seen or r not in self._roles:
                continue
            seen.add(r)
            stack.extend(self._roles[r].roles)
        return seen

    def _purge_grantee(self, name: str) -> None:
        for key in [k for k in self._grants if k[0] == name]:
            del self._grants[key]

    def _check_priv_name(self, privilege: str) -> None:
        if privilege not in PRIVILEGES:
            raise ValueError(f"unknown privilege {privilege}")
