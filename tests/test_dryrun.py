"""Wall-clock regression guard for the driver's multi-chip dryrun.

Round 1 and round 2 both shipped a green multi-chip capability whose only
driver-visible artifact (MULTICHIP_r0N.json) read broken — r2's cause was an
eval-render chunk of 16384 padding a 576-ray image 28x and exploding the
8-way-sharded XLA:CPU compile (>15 min).  This test runs the ACTUAL dryrun
body in-process (conftest already provides the forced-CPU 8-device platform
the subprocess re-exec exists to guarantee) and fails if it regresses past a
budget far below the driver's timeout.
"""

import sys
import time
from pathlib import Path

# repo root (where __graft_entry__.py lives) onto the path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BUDGET_S = 300  # driver allows ~1200; regression margin 4x


def test_dryrun_child_completes_within_budget(capsys):
    import __graft_entry__ as ge

    t0 = time.monotonic()
    ge._dryrun_child(8)
    elapsed = time.monotonic() - t0
    out = capsys.readouterr().out
    assert "dryrun_multichip(8): ok" in out
    assert elapsed < BUDGET_S, (
        f"dryrun took {elapsed:.0f}s (budget {BUDGET_S}s) — the driver "
        "artifact will read rc=124 again; check render chunk / eval_iters"
    )
