"""Users/roles/grants catalog (Parser/ParserNode.h:876-1137 parity)."""

from __future__ import annotations

import pytest

from compass_query_optimizer_spark.sources.acl import AccessControl, AccessDenied


@pytest.fixture()
def acl():
    a = AccessControl()
    a.create_user("root", "rootpw", is_super=True)
    a.create_user("alice", "apw")
    a.create_user("bob", "bpw")
    a.create_role("analyst")
    a.create_role("admin")
    return a


def test_authentication_and_alter(acl):
    assert acl.authenticate("alice", "apw")
    assert not acl.authenticate("alice", "wrong")
    assert not acl.authenticate("ghost", "x")
    acl.alter_user("alice", password="newpw")
    assert not acl.authenticate("alice", "apw")
    assert acl.authenticate("alice", "newpw")


def test_direct_grant_and_revoke(acl):
    acl.grant_privilege("SELECT", "lineitem", "alice")
    assert acl.has_privilege("alice", "SELECT", "lineitem")
    assert not acl.has_privilege("alice", "SELECT", "orders")
    assert not acl.has_privilege("alice", "INSERT", "lineitem")
    acl.revoke_privilege("SELECT", "lineitem", "alice")
    assert not acl.has_privilege("alice", "SELECT", "lineitem")


def test_role_resolution_is_transitive(acl):
    acl.grant_privilege("SELECT", "*", "analyst")
    acl.grant_role("analyst", "admin")  # admin inherits analyst
    acl.grant_role("admin", "bob")
    assert acl.has_privilege("bob", "SELECT", "anything")
    acl.revoke_role("admin", "bob")
    assert not acl.has_privilege("bob", "SELECT", "anything")


def test_role_cycles_rejected(acl):
    acl.grant_role("analyst", "admin")
    with pytest.raises(ValueError, match="cycle"):
        acl.grant_role("admin", "analyst")
    with pytest.raises(ValueError, match="cycle"):
        acl.grant_role("analyst", "analyst")


def test_superuser_bypasses_grants(acl):
    assert acl.has_privilege("root", "DROP", "lineitem")
    acl.alter_user("root", is_super=False)
    assert not acl.has_privilege("root", "DROP", "lineitem")


def test_authorize_raises(acl):
    with pytest.raises(AccessDenied, match="alice lacks INSERT"):
        acl.authorize("alice", "INSERT", "orders")
    acl.grant_privilege("INSERT", "orders", "alice")
    acl.authorize("alice", "INSERT", "orders")  # no raise


def test_drop_user_and_role_purge_grants(acl):
    acl.grant_privilege("SELECT", "t", "bob")
    acl.drop_user("bob")
    acl.create_user("bob", "b2")
    assert not acl.has_privilege("bob", "SELECT", "t")  # grants not resurrected
    acl.grant_privilege("SELECT", "t", "analyst")
    acl.grant_role("analyst", "bob")
    acl.drop_role("analyst")
    assert not acl.has_privilege("bob", "SELECT", "t")


def test_unknown_names_and_privileges(acl):
    with pytest.raises(ValueError, match="unknown privilege"):
        acl.grant_privilege("LAUNCH", "t", "alice")
    with pytest.raises(KeyError):
        acl.grant_privilege("SELECT", "t", "ghost")
    with pytest.raises(ValueError, match="already exists"):
        acl.create_user("alice", "x")
    with pytest.raises(ValueError, match="already exists"):
        acl.create_role("alice")  # user/role namespaces are shared


def test_show_privileges_direct_and_inherited(acl):
    acl.grant_privilege("SELECT", "orders", "alice")
    acl.create_role("senior")
    acl.grant_role("senior", "analyst")   # nested: senior -> analyst
    acl.grant_role("analyst", "alice")
    acl.grant_privilege("SELECT", "lineitem", "analyst")
    acl.grant_privilege("DROP", "*", "senior")
    assert acl.show_privileges("alice") == [
        ("alice", "SELECT", "orders"),
        ("analyst", "SELECT", "lineitem"),
        ("senior", "DROP", "*"),
    ]
    # a role's listing covers only its own reachable graph
    assert acl.show_privileges("analyst") == [
        ("analyst", "SELECT", "lineitem"),
        ("senior", "DROP", "*"),
    ]
    with pytest.raises(KeyError):
        acl.show_privileges("ghost")
