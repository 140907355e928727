"""Assemble SCALING_r05.json (VERDICT r4 next-round #5).

Round-5 change vs SCALING_r04: the information-free 8-device virtual-CPU
wall-clock row (0.021 — all virtual devices share one host core, kernels
in interpret mode) is REPLACED by the thing that actually predicts
hardware behavior: a bandwidth-model bound on 2-host weak-scaling
efficiency computed from the 16-device AOT-compiled HLO's collective
bytes (scripts/aot_multihost.py), charged at zero compute/comm overlap
and the full 16-ring factor — both pessimistic.

    python scripts/make_scaling_r05.py --aot-log _work/aot16.log \
        [--tpu-record '<json line from bench_scaling.py on the chip>']
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--aot-log", required=True)
    ap.add_argument("--tpu-record", default="",
                    help="JSON line printed by bench_scaling.py on the chip")
    ap.add_argument("--out", default="SCALING_r05.json")
    args = ap.parse_args()

    aot = None
    with open(args.aot_log) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and "two_host_topology_aot" in line:
                aot = json.loads(line)
    assert aot is not None, "no AOT record found in the log"
    aot["note"] = (
        "compile-only structural + bandwidth-model evidence "
        "(scripts/aot_multihost.py); no 16-device hardware in-image to "
        "execute on. predicted_2host charges every collective the full "
        "16-device ring factor with ZERO compute/comm overlap (both "
        "pessimistic; XLA overlaps the weight-grad psum with the "
        "backward pass), per-device batch held fixed (weak scaling)."
    )

    records = []
    if args.tpu_record:
        records.append(json.loads(args.tpu_record))
    records.append(aot)

    out = {
        "note": (
            "Round-5 scaling evidence. Only one real chip is reachable "
            "in this environment, so multi-device efficiency cannot be "
            "measured; the round-4 8-device virtual-CPU wall-clock row "
            "(0.021, harness_validation_only) is replaced by a "
            "bandwidth-model prediction computed from the collective "
            "bytes of the 16-device (2 hosts x 8 chips) AOT-compiled "
            "Reso64 fused train step. Under ICI-class inter-host links "
            "(90 GB/s) the predicted 2-host weak-scaling efficiency is "
            "above the >=85% BASELINE.md target even with zero overlap "
            "assumed; under DCN-only links (25 GB/s, not the intended "
            "deployment) it is not, and the record says so."
        ),
        "records": records,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1)[:800])


if __name__ == "__main__":
    main()
