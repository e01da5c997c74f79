"""Recall-vs-time sweep harness: the quality/latency trade-off CURVE.

Reference analogue: ``local-benchmarks.py:180-274`` publishes ingestion
and query time *vs recall* sweeps (nprobe / block sweeps) rather than a
single operating point.  A single-point recall gate cannot see a
trade-off regression (e.g. an nprobe default drift that keeps the gated
point green while the rest of the curve collapses); this harness sweeps

    IVF_FLAT        nprobe ∈ {1..32}
    IVF_PQ          nprobe ∈ {1..32} × k_factor ∈ {1, 4}
    VAMANA          l_search ∈ {20, 50, 100, 200} at full probe
    VAMANA ±overlay nprobe ∈ {1, 2, 4} (the boundary-recall regime the
                    cross-shard overlay exists for)
    IVF ±overlay    nprobe ∈ {1, 2, 4} (same machinery, ported r8 —
                    indexes/overlay.py)
    IVF_PQ +overlay nprobe ∈ {1, 2, 4} at k_factor=4 (r8: raw-vector
                    bridge rows fix routing AND ADC loss)

over the driver embeddings table at $SPARK_GRAFT_SF_DIR (default sf0.1),
measures recall@10 against the exact brute-force kernel, and writes the
curve to RECALL_CURVE.json.

The single-point gates (IVF ≥ 0.85 full-probe, IVF_PQ ≥ 0.85 with
re-rank, Vamana ≥ 0.85) are asserted FROM the curve: the process exits
non-zero if the corresponding swept config misses its gate, so the curve
artifact and the gate can never disagree.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F

K = 10
NQ = 100
PARTITIONS = 32
NPROBES = [1, 2, 4, 8, 16, 32]  # 32 = full probe (zero routing loss)
K_FACTORS = [1.0, 4.0]
L_SEARCHES = [20, 50, 100, 200]

# the single-point gates the curve must clear — the same FULL-PROBE
# operating points and margins as the driver registry's *_recall_gate
# entries (partial-probe points on the curve carry routing loss by design)
GATES = [
    # (index, config-predicate, min recall)
    ("IVF_FLAT", {"nprobe": PARTITIONS}, 0.85),
    # raised from 0.75 after the spark-0.3 residual-encoding switch and
    # the reference-default 16 subspaces: the sweep point went 0.767 ->
    # ~0.97, so the gate has margin AND teeth (a regression back to
    # raw-code/coarse-subspace ADC fails it)
    ("IVF_PQ", {"nprobe": PARTITIONS, "k_factor": 4.0}, 0.85),
    ("VAMANA", {"l_search": 100}, 0.85),
    # partial probe IS the overlay's operating mode, so its gates sit at
    # the partial-probe points (r6: per-boundary-pair waterfill selection
    # + exact overlay scan lifted 0.843 → 0.856; deterministic builds
    # make the number reproducible).  r7: the level-weighted audit + the
    # pure-audit boost tranche put the CHEAPEST probe settings under
    # gates too — nprobe=1/2 is where a 100 TB operator actually runs
    # (measured 0.729 / 0.815 / 0.922 at 512+384)
    ("VAMANA_OVERLAY", {"nprobe": 1}, 0.65),
    ("VAMANA_OVERLAY", {"nprobe": 2}, 0.78),
    ("VAMANA_OVERLAY", {"nprobe": 4}, 0.85),
    # r8 IVF port of the same machinery: measured 0.616 / 0.657 / 0.722
    # at the same caps (512+384) vs the plain index's 0.240 / 0.327 /
    # 0.464 floor — IVF partitions are coarser than Vamana shards here
    # (32 vs the shard fanout), so the absolute points sit lower; gates
    # carry ~0.07-0.10 margin like the Vamana twins did at introduction.
    # r11 NEGATIVE RESULT (tools/overlay_ceiling.py): the expectation-
    # optimal STATIC 896-row overlay on this corpus ceilings at
    # 0.654/0.707/0.777 (recall@10 is linear in covered missed
    # incidences, so rank-by-population-miss-count — what the audit
    # already computes from a full-population sample here — IS the
    # optimal static selection).  The shipped points sit at ~94% of
    # that ceiling; a pure-audit allocation measured +0.008 (inside
    # noise) and a 4×/full audit sample changed nothing (the sample
    # already covers the corpus).  The floor gap vs Vamana is the
    # 32-cell vs 8-shard fanout — the overlay LIFT is equal (+0.376 vs
    # +0.361).  Gates stay at the measured floors: raising them needs
    # budget or probes, not selection cleverness.
    ("IVF_FLAT_OVERLAY", {"nprobe": 1}, 0.52),
    ("IVF_FLAT_OVERLAY", {"nprobe": 2}, 0.58),
    ("IVF_FLAT_OVERLAY", {"nprobe": 4}, 0.65),
    # PQ twin (r8): overlay rows are raw vectors scored exactly, so the
    # bridge set fixes routing AND ADC loss — measured 0.616/0.657/0.722
    # at k_factor=4 (plain floor 0.240/0.327/0.464); same gates as FLAT
    ("IVF_PQ_OVERLAY", {"nprobe": 1, "k_factor": 4.0}, 0.52),
    ("IVF_PQ_OVERLAY", {"nprobe": 2, "k_factor": 4.0}, 0.58),
    ("IVF_PQ_OVERLAY", {"nprobe": 4, "k_factor": 4.0}, 0.65),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = os.environ.get("SPARK_GRAFT_RECALL_OUT", "RECALL_CURVE.json")
    work = "/tmp/tvs_recall_sweep"
    shutil.rmtree(work, ignore_errors=True)

    from tiledb_vector_search_spark import get_spark
    from tiledb_vector_search_spark.indexes import (
        IVFFlatIndex,
        IVFPQIndex,
        VamanaIndex,
    )
    from tiledb_vector_search_spark.operators.knn import knn_bruteforce_kernel

    spark = get_spark(app_name="tvs-recall-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vectors = emb.select(
        F.col("vec_id").alias("external_id"), F.col("embedding").alias("vector")
    )
    queries = vectors.where(f"external_id < {NQ}").select(
        F.col("external_id").alias("query_id"), "vector"
    )

    truth: dict[int, set[int]] = {}
    for r in knn_bruteforce_kernel(vectors, queries, K, "sum_of_squares").collect():
        truth.setdefault(int(r.query_id), set()).add(int(r.external_id))
    denom = sum(len(v) for v in truth.values())

    def recall_and_time(fn) -> tuple[float, float]:
        t0 = time.perf_counter()
        rows = fn().collect()
        sec = time.perf_counter() - t0
        hits = sum(
            1 for r in rows if int(r.external_id) in truth.get(int(r.query_id), ())
        )
        return hits / denom, sec

    curve: list[dict] = []

    def sweep(index_name: str, config: dict, fn) -> None:
        recall, sec = recall_and_time(fn)
        curve.append(
            {
                "index": index_name,
                **config,
                "recall_at_10": round(recall, 4),
                "sec": round(sec, 3),
            }
        )
        print(f"{index_name} {config}: recall={recall:.4f} sec={sec:.2f}",
              file=sys.stderr)

    t_build = {}
    t0 = time.perf_counter()
    ivf = IVFFlatIndex.ingest(
        spark, f"{work}/ivf", vectors, partitions=PARTITIONS, timestamp=1000
    )
    t_build["IVF_FLAT"] = round(time.perf_counter() - t0, 3)
    # untimed warm-up per index: the first query pays Python-worker spinup
    # and broadcast costs that would otherwise land on one curve point
    ivf.query(queries, K, nprobe=1).collect()
    for nprobe in NPROBES:
        sweep("IVF_FLAT", {"nprobe": nprobe},
              lambda np_=nprobe: ivf.query(queries, K, nprobe=np_))

    # partial-probe recall with the r8 overlay port (shared machinery,
    # indexes/overlay.py) — same caps as the Vamana twin below so the
    # two families' cheap-probe floors are directly comparable
    t0 = time.perf_counter()
    ivf_ov = IVFFlatIndex.ingest(
        spark, f"{work}/ivf_ov", vectors, partitions=PARTITIONS,
        timestamp=1000, overlay=True, overlay_max=512,
        overlay_audit_nprobe=4, overlay_boost_max=384,
    )
    t_build["IVF_FLAT_OVERLAY"] = round(time.perf_counter() - t0, 3)
    ivf_ov.query(queries, K, nprobe=1).collect()
    for nprobe in (1, 2, 4):
        sweep("IVF_FLAT_OVERLAY", {"nprobe": nprobe},
              lambda np_=nprobe: ivf_ov.query(queries, K, nprobe=np_))

    t0 = time.perf_counter()
    pq = IVFPQIndex.ingest(
        spark, f"{work}/pq", vectors, partitions=PARTITIONS, num_subspaces=16,
        timestamp=1000,
    )
    t_build["IVF_PQ"] = round(time.perf_counter() - t0, 3)
    pq.query(queries, K, nprobe=1).collect()
    for kf in K_FACTORS:
        for nprobe in NPROBES:
            sweep(
                "IVF_PQ", {"nprobe": nprobe, "k_factor": kf},
                lambda np_=nprobe, kf_=kf: pq.query(
                    queries, K, nprobe=np_, k_factor=kf_
                ),
            )

    # PQ twin of the overlay sweep: the bridge rows are raw vectors, so
    # for IVF_PQ the overlay fixes BOTH cheap-probe loss sources (routing
    # AND ADC quantization) — swept at the family's k_factor=4 operating
    # point (same caps as the other overlay families)
    t0 = time.perf_counter()
    pq_ov = IVFPQIndex.ingest(
        spark, f"{work}/pq_ov", vectors, partitions=PARTITIONS,
        num_subspaces=16, timestamp=1000, overlay=True, overlay_max=512,
        overlay_audit_nprobe=4, overlay_boost_max=384,
    )
    t_build["IVF_PQ_OVERLAY"] = round(time.perf_counter() - t0, 3)
    pq_ov.query(queries, K, nprobe=1).collect()
    for nprobe in (1, 2, 4):
        sweep(
            "IVF_PQ_OVERLAY", {"nprobe": nprobe, "k_factor": 4.0},
            lambda np_=nprobe: pq_ov.query(
                queries, K, nprobe=np_, k_factor=4.0
            ),
        )

    t0 = time.perf_counter()
    vam = VamanaIndex.ingest(
        spark, f"{work}/vamana", vectors, shards=8, timestamp=1000
    )
    t_build["VAMANA"] = round(time.perf_counter() - t0, 3)
    vam.query(queries, K, nprobe=8, l_search=20).collect()
    for ls in L_SEARCHES:
        sweep("VAMANA", {"l_search": ls},
              lambda ls_=ls: vam.query(queries, K, nprobe=8, l_search=ls_))
    # partial-probe recall with vs without the cross-shard overlay — the
    # regime the bridge graph exists for (boundary queries at low nprobe)
    t0 = time.perf_counter()
    # overlay capped at ~25% of this corpus — the honest operating point
    # (the default 8192 cap would swallow the whole sf0.1 table and make
    # the overlay a trivial full copy)
    vam_ov = VamanaIndex.ingest(
        spark, f"{work}/vamana_ov", vectors, shards=8, timestamp=1000,
        overlay=True, overlay_max=512,
        # the overlay tunes to the deployment's probe budget; this
        # harness's declared partial-probe operating point is nprobe=4,
        # and the level-weighted audit scores nprobe=1/2 alongside it
        overlay_audit_nprobe=4,
        # second, pure-audit tranche for the cheapest probe settings
        # (total extra rows 512+384 ≈ 18% of this corpus — still an
        # honest cap; at production scale both are O(10k) over billions)
        overlay_boost_max=384,
    )
    t_build["VAMANA_OVERLAY"] = round(time.perf_counter() - t0, 3)
    vam_ov.query(queries, K, nprobe=1).collect()
    for nprobe in (1, 2, 4):
        sweep("VAMANA", {"nprobe": nprobe},
              lambda np_=nprobe: vam.query(queries, K, nprobe=np_))
        sweep("VAMANA_OVERLAY", {"nprobe": nprobe},
              lambda np_=nprobe: vam_ov.query(queries, K, nprobe=np_))

    sf = sf_dir.rstrip("/").split("sf")[-1]
    artifact = {
        "sf": float(sf),
        "k": K,
        "nq": NQ,
        "build_sec": t_build,
        "curve": curve,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)

    failures = []
    for index_name, pred, min_recall in GATES:
        match = [
            c for c in curve
            if c["index"] == index_name
            and all(c.get(k) == v for k, v in pred.items())
        ]
        assert match, f"gate config not swept: {index_name} {pred}"
        if match[0]["recall_at_10"] < min_recall:
            failures.append((index_name, pred, match[0]["recall_at_10"], min_recall))

    print(json.dumps({
        "metric": "recall_sweep",
        "configs": len(curve),
        "gates_passed": len(GATES) - len(failures),
        "gates_total": len(GATES),
        "out": out_path,
        "sf": float(sf),
    }))
    spark.stop()
    if failures:
        for idx_name, pred, got, want in failures:
            print(f"GATE FAIL {idx_name} {pred}: {got} < {want}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
