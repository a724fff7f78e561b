"""CLI for the VPU op-rate probe (legionsolvers_tpu/utils/vpu_probe.py):
measures sustained fma / lane-roll / sublane-shift rates on the attached
chip and writes VPU_RATES.json at the repo root (the compute-roofline
calibration used by bench.py; see PROFILE_r03.md).

Usage: python scripts/probe_vpu.py [--remeasure]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from legionsolvers_tpu.utils import vpu_probe

    path = os.path.join(os.path.dirname(__file__), "..", "VPU_RATES.json")
    if "--remeasure" in sys.argv and os.path.exists(path):
        os.remove(path)
    rates = vpu_probe.load_or_measure(os.path.abspath(path))
    print(json.dumps(rates))


if __name__ == "__main__":
    main()
