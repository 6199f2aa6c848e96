"""tools/rotate_gates.py: the driver-coverage rotation — never-checked
gates lead, then ascending by most recent driver CORRECTNESS round."""

import sys

sys.path.insert(0, "/root/repo/tools")


def test_rotated_ordering_rules():
    from rotate_gates import rotated

    keys = ["a", "b", "c", "d", "e"]
    seen = {"a": 4, "b": 3, "d": 4}  # c, e never checked
    out = rotated(keys, seen)
    # never-checked first (original relative order), then r3, then r4
    assert out == ["c", "e", "b", "a", "d"]


def test_current_entry_ordering_is_fresh():
    """The committed queries() ordering must match the artifacts on
    disk — a stale rotation silently starves driver coverage (the
    round-4 verdict's #1 finding)."""
    from rotate_gates import current_keys, last_seen, rotated

    src = open("/root/repo/__spark_entry__.py").read()
    keys = current_keys(src)
    assert len(keys) >= 129
    assert keys == rotated(keys, last_seen())


def test_every_query_key_extracted():
    import __spark_entry__ as e
    from rotate_gates import current_keys

    src = open("/root/repo/__spark_entry__.py").read()
    assert current_keys(src) == list(e.queries().keys())
