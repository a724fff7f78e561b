"""Compiled-schedule overlap check (upgrade of test_18's jaxpr-level proxy).

tests/test_18_overlap.py proves the fused iteration's Pallas pass has no
DATAFLOW dependence on the halo ppermutes; this test asserts the stronger
scheduler-level property on the actual TPU backend's compiled schedule:
``collective-permute-start`` issues before the Pallas custom-call and
``-done`` retires after it (the exchange flies during the kernel — the
TPU-native analog of Legion's async ghost copies, reference:
COOMatrix.cpp:172-188).

The program is AOT-compiled for a device-less v5e 2x2 topology via
``jax.experimental.topologies`` — no chips needed, but the TPU *compiler*
must be reachable, so the test skips on CPU-only environments (the suite's
conftest forces the CPU backend; the TPU toolchain may still be present —
we probe for it).  The committed artifact from a real run is
``HLO_OVERLAP.txt`` at the repo root (regenerate with
``python scripts/dump_overlap_hlo.py``).
"""

import os
import sys

import pytest


def _tpu_compiler_available():
    try:
        from jax.experimental import topologies

        topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x2",
            chips_per_host_bounds=(2, 2, 1), num_slices=1,
        )
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not os.environ.get("LEGIONSOLVERS_HLO_TESTS"),
    reason="AOT TPU compile takes minutes on a cold cache; "
    "set LEGIONSOLVERS_HLO_TESTS=1 (or run scripts/dump_overlap_hlo.py)",
)
def test_overlap_schedule_straddles_kernel():
    if not _tpu_compiler_available():
        pytest.skip("TPU compiler not reachable from this environment")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.dump_overlap_hlo import build_compiled, check_schedule

    # round 4: BiCGStab runs single-exchange (derived v-edge halos), so
    # both solvers assert FULL overlap
    for solver, req in (("cg", "all"), ("bicgstab", "all")):
        ok, report, violations = check_schedule(
            build_compiled(solver).as_text(), req)
        assert ok, (f"{solver}: overlap violations in compiled schedule: "
                    f"{violations}\n" + "\n".join(report))


def test_committed_overlap_artifact_is_clean():
    """The committed HLO_OVERLAP.txt (from a real TPU-compiler run) must
    record a passing check: the loop body's permute start/done pairs
    straddle a Pallas custom-call."""
    path = os.path.join(os.path.dirname(__file__), "..", "HLO_OVERLAP.txt")
    if not os.path.exists(path):
        pytest.skip("no committed artifact")
    with open(path) as f:
        txt = f.read()
    assert "ok=True" in txt and "ok=False" not in txt
    assert "collective-permute-start" in txt and "kernel" in txt
    # round 4: the artifact must be from require=all runs for BOTH solvers
    # (the single-exchange BiCGStab leaves no unasserted exchange) with no
    # surviving non-overlapped pairs
    assert "require=first" not in txt
    assert txt.count("non_overlapped=[]") >= 2, txt
