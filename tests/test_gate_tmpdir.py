"""The per-process gate-fixture root (`_gate_tmpdir`) sweep must never
delete a root whose owning process is still alive — a long-running
selfcheck's memoized `_fx` fixtures would vanish mid-run when a second
process starts up (the root's mtime only refreshes on NEW fixtures, so
age alone is not liveness)."""

import os
import re
import shutil
import tempfile
import time


def _sweep_once():
    """Run the sweep path in a pristine module state and return the
    fresh root it creates."""
    import __spark_entry__ as entry

    saved = list(entry._GATE_TMP_ROOT)
    entry._GATE_TMP_ROOT.clear()
    try:
        d = entry._gate_tmpdir("probe-")
        root = entry._GATE_TMP_ROOT[0]
    finally:
        entry._GATE_TMP_ROOT.clear()
        entry._GATE_TMP_ROOT.extend(saved)
    return d, root


def test_root_name_embeds_owner_pid():
    d, root = _sweep_once()
    m = re.match(r"leann-gate-tmp-(\d+)-", os.path.basename(root))
    assert m and int(m.group(1)) == os.getpid()
    shutil.rmtree(root, ignore_errors=True)


def test_sweep_spares_live_owner_and_removes_dead_owner():
    # a root owned by THIS process (alive), artificially 3 h stale
    live = tempfile.mkdtemp(prefix=f"leann-gate-tmp-{os.getpid()}-x")
    fixture = os.path.join(live, "fixture")
    os.mkdir(fixture)
    stale = time.time() - 3 * 3600
    os.utime(live, (stale, stale))
    # a root owned by a certainly-dead pid, brand new
    dead_pid = 2 ** 22 + 7  # above any default pid_max
    dead = tempfile.mkdtemp(prefix=f"leann-gate-tmp-{dead_pid}-x")
    try:
        _d, root = _sweep_once()
        assert os.path.isdir(fixture), "live owner's fixtures were swept"
        assert not os.path.isdir(dead), "dead owner's root survived"
        shutil.rmtree(root, ignore_errors=True)
    finally:
        shutil.rmtree(live, ignore_errors=True)
        shutil.rmtree(dead, ignore_errors=True)
