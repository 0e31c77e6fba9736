"""Driver-contract invariants: every gate-priority name resolves,
every query has an oracle (or is knowingly oracle-less), and the two
dicts enumerate identically."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_gate_priority_names_resolve_and_are_unique():
    qs = entrymod.queries()
    gate = entrymod._GATE_PRIORITY
    missing = [n for n in gate if n not in qs]
    assert not missing, f"gate names not in queries(): {missing}"
    assert len(set(gate)) == len(gate), "duplicate gate names"


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(qs) == set(oracles)
    # the GATE prefix must enumerate identically in both dicts (the
    # driver checks the first 50 in order); past it, per-name lookup
    # makes order irrelevant
    n = len(entrymod._GATE_PRIORITY)
    assert list(qs)[:n] == list(oracles)[:n]
    # every oracle is non-trivial SQL text
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_gate_priority_leads_enumeration():
    qs = list(entrymod.queries())
    gate = [n for n in entrymod._GATE_PRIORITY]
    assert qs[: len(gate)] == gate
