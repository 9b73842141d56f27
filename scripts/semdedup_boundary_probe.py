#!/usr/bin/env python
"""SemDeDup cross-list boundary-miss probe (VERDICT r13 #3).

The planted-twin recall probe (scripts/semdedup_scale_probe.py)
structurally CANNOT measure the pair class a within-list decision
misses: exact twins always co-assign to the same coarse list, so
planted recall reads 1.0 however many genuine near-dup pairs straddle
a list boundary. This probe runs the shipped measurement instrument
(`semdedup_boundary_miss`: exact all-pairs ground truth at the
registry τ) and both decision variants at sf0.001 and sf0.01, and
records per cell:

- n_true_pairs / n_visible_primary / n_visible_top2 and the two miss
  rates straight from the certificate query;
- total drops from `semdedup_apply` (primary-only) vs
  `semdedup_apply_multiprobe` (soft top-2 membership), plus the
  dominance check (multiprobe >= base per primary list).

Expect HIGH primary miss rates on these fixtures: the embeddings are
seeded near-random, so at the fixture τ (the ~0.9-quantile of
within-list NN cosine) most true pairs are boundary pairs almost by
construction — which is exactly the regime where the certificate
matters. On a trained encoder at τ≈0.9+ the clusters are tight and
the primary miss rate is far lower; the instrument, not the rate, is
the shipped claim.

Usage: python scripts/semdedup_boundary_probe.py
Writes results/semdedup_boundary_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.operators.similarity import (  # noqa: E402
    SEMDEDUP_TAU,
    semdedup_apply,
    semdedup_apply_multiprobe,
    semdedup_boundary_miss,
)
from benchmark_pandas_vs_polars_vs_datatable_vs_tablesaw_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    spark = get_spark(cpus=16, shuffle_partitions=16)
    cells = []
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        t0 = time.monotonic()
        cert = semdedup_boundary_miss(spark, sf_dir).collect()[0].asDict()
        cert_s = round(time.monotonic() - t0, 2)
        base = {r.list_id: r for r in semdedup_apply(spark, sf_dir).collect()}
        multi = {
            r.list_id: r for r in semdedup_apply_multiprobe(spark, sf_dir).collect()
        }
        assert cert["n_true_pairs"] > 0, "vacuous certificate"
        assert set(base) == set(multi)
        for lid in base:
            assert multi[lid].n_dropped >= base[lid].n_dropped, (
                f"dominance violated in list {lid}"
            )
        cells.append(
            {
                "sf_dir": sf_dir,
                "tau": SEMDEDUP_TAU,
                **cert,
                "certificate_wall_s": cert_s,
                "n_dropped_primary_only": sum(r.n_dropped for r in base.values()),
                "n_dropped_multiprobe": sum(r.n_dropped for r in multi.values()),
                "dominance_per_list": True,
            }
        )
        print(json.dumps(cells[-1]), file=sys.stderr)
    out = {
        "probe": "semdedup_boundary_miss",
        "note": (
            "ground truth = exact all-pairs cosine >= tau (the Θ(N²) "
            "instrument, run at certificate scale); miss_rate_primary is "
            "the pair class invisible to semdedup_apply, miss_rate_top2 "
            "the residual after soft top-2 membership "
            "(semdedup_apply_multiprobe)"
        ),
        "cells": cells,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        "semdedup_boundary_probe.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
