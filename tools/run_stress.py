#!/usr/bin/env python
"""Stress harness: ad-hoc timing mode + the per-round scale-correctness GATE.

Timing mode (same min-of-2-warm methodology as bench.py; query set and
data dir from the command line):

    python tools/run_stress.py /tmp/sfx minhash_lsh_pairs neardup_clusters

Gate mode (r07 verdict #2 — the three r07 silent-at-scale bugs were only
caught because the stress battery happened to be re-run late in the
session; this makes it a committed, per-round artifact):

    python tools/run_stress.py --gate --out STRESS_r08.json

For every size-routed operator, regenerate a /tmp corpus ABOVE its route
boundary — where the approximate/banded path actually executes — and
assert a floor against exact ground truth:

  lsh_router_topk_recall   similarity_topk_auto at 50k rows (exact cap
                           20k): sampled top-5 recall vs numpy exact GT
                           >= 0.95 (r07 receipt: the pre-fix router
                           measured 0.0 here).
  eps_pairs_recall         eps_neighborhood_pairs at 50k rows, θ=0.9:
                           sampled per-probe neighbor recall >= 0.95
                           (r07 receipt: 0 of 600k pairs pre-fix).
  ivf_recall               ivf_topk (deterministic quantizer) at 50k:
                           sampled recall >= the 0.5 contract floor.
  simhash_routes_identical banded route (forced via max_rows=0) vs BNLJ
                           route at 25k docs: identical pair sets —
                           banding is exact by pigeonhole, so ANY
                           difference is a bug, not a recall trade.
  lsh_megabucket_chain     30k near-identical vectors (every bucket a
                           mega-bucket): the bucket cap must emit the
                           spillable n-1 chain, never the n² bucket
                           blow-up.
  minhash_planted_neardup_recall  planted near-copies (last 2 tokens
                           dropped, shingle Jaccard >= ~0.9) must be
                           recovered by the banded-LSH candidate path
                           at >= 0.95 — the probabilistic-recall check
                           the simhash dual-route equality can't give.
  lsh_oracle_overcap_parity cosine_topk_lsh full Spark<->DuckDB parity
                           at 25k vectors, where every fixed-16-plane
                           bucket is over LSH_MAX_BUCKET_SIZE — pins the
                           r08 oracle chain-replay (ADVICE r07 medium)
                           above the corpus size that used to red it.
  eps_dense_guard_routes   (r09, verdict r08 #4) the 30k near-identical
                           sfdup corpus is OUTPUT-BOUND (true graph
                           n²/2): the measured density guard must
                           RAISE by default, and on_dense='chain' must
                           return exactly the n-1 connectivity chain.
  dup_heavy_650k_topk_recall / dup_heavy_650k_eps_exact
                           (r09, verdict r08 #3) 120k gaussian bases
                           x5 reps + one 50k near-identical mega-
                           cluster (650k rows — dup-heavy AND skewed,
                           an order past the 50k checks, fires
                           _lsh_shuffle_partitions): top-k recall vs
                           numpy GT >= 0.95 on clique probes, and the
                           eps pair count must equal the ANALYTIC
                           truth: bases*C(5,2) + (mega-1) chain pairs.
  simhash_wide_518k_planted (r09 width fix) 518.5k docs — ABOVE the
                           200k BNLJ/banded boundary, so the banded
                           route fires naturally on inferred-62-bit
                           signatures: the planted near-copy pairs
                           returned must EQUAL the numpy hamming GT
                           set (pigeonhole set equality, not a floor)
                           with text-level radius yield >= 0.9.
  minhash_megabucket_540k  (r09 session 3) 540k docs with a 40k-doc
                           single-template cluster through
                           minhash_dedup_pairs(max_bucket_size=500):
                           output stays bounded (no C(40k,2)=800M
                           blow-up), the cluster remains ONE connected
                           component through the b-1 window chain
                           (>= 99.8% membership; the tail is docs LSH
                           itself drops from the mega bucket), and
                           planted near-copy recall elsewhere >= 0.95
                           (small buckets ride the uncapped plan).

Emits one JSON line (and --out file): {"checks": {...}, "n_fail": N};
exit code 1 on any failure so a red gate turns the round red.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

GATE_DIR = "/tmp/stress_gate"


def _timing_mode(sf_dir: str, names: list[str]) -> None:
    from bigdataamazon_spark import queries as registry
    from bigdataamazon_spark.session import get_spark

    spark = get_spark("bigdataamazon-stress")
    qs = registry.queries()
    timings: dict[str, float | str] = {}
    for name in names:
        try:
            qs[name](spark, sf_dir).count()  # warm
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                qs[name](spark, sf_dir).count()
                best = min(best, time.perf_counter() - start)
            timings[name] = round(best, 4)
        except Exception as e:  # a tripped scale guard is a RESULT here
            timings[name] = f"error: {type(e).__name__}: {e}"[:200]
        spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "queries": timings}))


# ---------------------------------------------------------------------------
# Gate mode
# ---------------------------------------------------------------------------


def _make_corpora() -> dict[str, str]:
    """Regenerate the above-boundary corpora fresh each run (stale /tmp
    data must never green a gate)."""
    from tools.make_stress import make_sfclique, make_sfdup, make_sfx

    dirs = {
        # 50k vectors (5000 × 10 near-dup shifts) + 25k docs — above the
        # 20k exact-GEMM cap and big enough that fixed-width LSH buckets
        # go over LSH_MAX_BUCKET_SIZE
        "sfx10": f"{GATE_DIR}/sfx10",
        # 25k vectors from sf0.01 ×50 — every fixed-16-plane bucket over
        # cap (mean bucket ~1560 vs cap 1024)
        "sflsh25": f"{GATE_DIR}/sflsh25",
        # 30k byte-identical docs — the mega-bucket pathology
        "sfdup": f"{GATE_DIR}/sfdup",
        # 650k rows: 120k clique bases ×5 + a 50k mega-cluster —
        # dup-heavy AND skewed, big enough that the keyed-row volume
        # (650k×4 bands) overflows the 32-partition session default and
        # _lsh_shuffle_partitions fires (r08 verdict #3)
        "sfclique": f"{GATE_DIR}/sfclique",
    }
    shutil.rmtree(GATE_DIR, ignore_errors=True)
    make_sfx("/root/testdata/sf0.1", dirs["sfx10"], doc_reps=5, emb_reps=10)
    make_sfx("/root/testdata/sf0.01", dirs["sflsh25"], doc_reps=2, emb_reps=50)
    make_sfdup("/root/testdata/sf0.01", dirs["sfdup"], n=30000)
    make_sfclique(dirs["sfclique"])
    return dirs


def _load_vectors(sf_dir: str):
    import duckdb
    import numpy as np

    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    return ids, mat


def _exact_gt(ids, mat, probe_idx, k: int, eps: float):
    """numpy exact ground truth for the sampled probes: top-k neighbor
    id sets and eps-neighbor id sets (cosine)."""
    import numpy as np

    nrm = np.linalg.norm(mat, axis=1)
    q = mat[probe_idx]
    s = (q @ mat.T) / np.outer(nrm[probe_idx], nrm)
    s[np.arange(len(probe_idx)), probe_idx] = -np.inf
    # argpartition, not a full row argsort: O(n) per probe instead of
    # O(n log n) — the difference between 7 minutes and seconds on a
    # 2M-column score matrix
    part = np.argpartition(-s, k, axis=1)[:, :k]
    ord_in_part = np.argsort(
        np.take_along_axis(-s, part, axis=1), axis=1, kind="stable"
    )
    top = np.take_along_axis(part, ord_in_part, axis=1)
    topk = {int(ids[p]): {int(ids[j]) for j in row} for p, row in zip(probe_idx, top)}
    epsn = {
        int(ids[p]): {int(ids[j]) for j in np.flatnonzero(s[i] >= eps)}
        for i, p in enumerate(probe_idx)
    }
    return topk, epsn


def _recall_topk(rows, gt: dict[int, set], k: int) -> float:
    hits, total = 0, 0
    found: dict[int, set] = {}
    for r in rows:
        found.setdefault(int(r["src"]), set()).add(int(r["dst"]))
    for src, want in gt.items():
        hits += len(found.get(src, set()) & want)
        total += min(k, len(want))
    return hits / total if total else 1.0


def _gate(out_path: str | None) -> int:
    # the 650k checks need more driver heap than the 16g session default
    # (local mode: executors share the driver JVM; the eps count at 650k
    # OOMs at 16g). Make the gate self-contained instead of relying on
    # the caller remembering the env var — must be set before the first
    # get_spark() in this process launches the JVM.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    import numpy as np
    from pyspark.sql import functions as F

    from bigdataamazon_spark.catalog import load_table
    from bigdataamazon_spark.operators import dedup, similarity
    from bigdataamazon_spark.session import get_spark
    from tests.parity import compare

    checks: dict[str, dict] = {}

    def record(name, value, floor, ok, wall, note=""):
        checks[name] = {
            "value": round(float(value), 4),
            "floor": floor,
            "pass": bool(ok),
            "wall_sec": round(wall, 1),
            **({"note": note} if note else {}),
        }
        print(f"gate {name}: {'PASS' if ok else 'FAIL'} "
              f"value={value:.4f} floor={floor} ({wall:.1f}s)", file=sys.stderr)

    t0 = time.perf_counter()
    dirs = _make_corpora()
    print(f"gate corpora regenerated in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    spark = get_spark("bigdataamazon-stress-gate")
    ids, mat = _load_vectors(dirs["sfx10"])
    rng_step = max(1, len(ids) // 500)
    probe_idx = np.arange(0, len(ids), rng_step)[:500]
    gt_topk, gt_eps = _exact_gt(ids, mat, probe_idx, k=5, eps=0.9)
    probe_ids = set(gt_topk)
    emb = load_table(spark, dirs["sfx10"], "embeddings")

    # 1. LSH router top-k recall above the exact cap
    t = time.perf_counter()
    topk = similarity.similarity_topk_auto(emb, "vec_id", "embedding", k=5)
    rows = topk.filter(F.col("src").isin(list(probe_ids))).collect()
    rec = _recall_topk(rows, gt_topk, k=5)
    record("lsh_router_topk_recall", rec, 0.95, rec >= 0.95,
           time.perf_counter() - t)

    # 2. eps-neighborhood recall above the exact cap
    t = time.perf_counter()
    eps_pairs = similarity.eps_neighborhood_pairs(
        emb, "vec_id", "embedding", threshold=0.9
    )
    prows = eps_pairs.filter(
        F.col("src").isin(list(probe_ids)) | F.col("dst").isin(list(probe_ids))
    ).collect()
    found_eps: dict[int, set] = {p: set() for p in probe_ids}
    for r in prows:
        s, d = int(r["src"]), int(r["dst"])
        if s in found_eps:
            found_eps[s].add(d)
        if d in found_eps:
            found_eps[d].add(s)
    want_total = sum(len(v) for v in gt_eps.values())
    hit_total = sum(len(found_eps[p] & gt_eps[p]) for p in probe_ids)
    rec = hit_total / want_total if want_total else 1.0
    record("eps_pairs_recall", rec, 0.95, rec >= 0.95,
           time.perf_counter() - t,
           note=f"{hit_total}/{want_total} sampled true pairs")

    # 3. IVF serving recall (deterministic quantizer, production config)
    t = time.perf_counter()
    cent_rows = emb.orderBy("vec_id").limit(16).collect()
    centroids = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    ivf = similarity.ivf_topk(emb, "vec_id", "embedding", k=5, centroids=centroids)
    rows = ivf.filter(F.col("src").isin(list(probe_ids))).collect()
    rec = _recall_topk(rows, gt_topk, k=5)
    record("ivf_recall", rec, 0.5, rec >= 0.5, time.perf_counter() - t)
    spark.catalog.clearCache()

    # 4. simhash: banded route (forced via max_rows=0) must equal the
    # BNLJ route at 25k docs — banding is exact by pigeonhole, so any
    # difference is a bug, not a recall trade
    t = time.perf_counter()
    docs = load_table(spark, dirs["sfx10"], "documents")
    sids = dedup.shingle_ids(dedup.doc_shingles(docs, distinct=False))
    sigs = dedup.simhash_signatures(sids).cache()
    bnlj = dedup.simhash_neardup_pairs(sigs, max_hamming=6, max_rows=10**9)
    banded = dedup.simhash_neardup_pairs(sigs, max_hamming=6, max_rows=0)
    n_b = bnlj.count()
    sym_diff = (
        bnlj.select("src", "dst").exceptAll(banded.select("src", "dst")).count()
        + banded.select("src", "dst").exceptAll(bnlj.select("src", "dst")).count()
    )
    record("simhash_routes_identical", sym_diff, 0, sym_diff == 0,
           time.perf_counter() - t, note=f"{n_b} pairs on both routes")
    sigs.unpersist()
    spark.catalog.clearCache()

    # 5. LSH bucket-cap mega-bucket pathology: 30k near-identical
    # vectors land in ONE bucket per band; the over-cap route must emit
    # the spillable n-1 adjacent chain, never the 450M-pair bucket
    # blow-up (r06 receipt)
    t = time.perf_counter()
    dup_emb = load_table(spark, dirs["sfdup"], "embeddings")
    n_dup = dup_emb.count()
    n_pairs = similarity.lsh_candidate_pairs(
        dup_emb, "vec_id", "embedding", dim=64, n_planes=16, bands=4
    ).count()
    record("lsh_megabucket_chain", n_pairs, n_dup - 1, n_pairs == n_dup - 1,
           time.perf_counter() - t, note=f"{n_dup} near-identical vectors")
    spark.catalog.clearCache()

    # 5b. the OUTPUT-BOUND contract (r09, verdict r08 #4): on the same
    # degenerate corpus the eps pair form must refuse by default (the
    # true graph is n²/2 — enumeration would be a vanishing sample) and
    # on_dense='chain' must return exactly the n-1 connectivity chain.
    t = time.perf_counter()
    raised = False
    try:
        similarity.eps_neighborhood_pairs(
            dup_emb, "vec_id", "embedding", threshold=0.9
        ).count()
    except ValueError as exc:
        raised = "OUTPUT-BOUND" in str(exc)
    chain_n = similarity.eps_neighborhood_pairs(
        dup_emb, "vec_id", "embedding", threshold=0.9, on_dense="chain"
    ).count()
    ok = raised and chain_n == n_dup - 1
    record("eps_dense_guard_routes", chain_n, n_dup - 1, ok,
           time.perf_counter() - t,
           note=f"raise fired: {raised}; chain pairs {chain_n}")
    spark.catalog.clearCache()

    # 6. MinHash banded-LSH recall on planted text near-dups: every
    # 20th doc gets a near-copy with its last 2 tokens dropped
    # (3-gram-shingle Jaccard >= ~0.9 on long docs; banded-LSH recall
    # at s=0.9, 4 bands x 4 rows is 1-(1-s^16/4)^4 ~ 0.99+). The
    # candidates here are PROBABILISTIC (unlike simhash pigeonhole),
    # so this is the recall check the dual-route equality can't give.
    import duckdb

    t = time.perf_counter()
    nd_dir = f"{GATE_DIR}/sfnd"
    os.makedirs(nd_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT doc_id, text, lang, source, n_chars
          FROM '{dirs["sfx10"]}/documents.parquet'
          UNION ALL
          SELECT doc_id + 50000000,
                 array_to_string(string_split(text, ' ')[1:len(string_split(text, ' ')) - 2],
                                 ' ') AS text,
                 lang, source, n_chars
          FROM '{dirs["sfx10"]}/documents.parquet'
          WHERE doc_id % 20 = 0 AND len(string_split(text, ' ')) >= 30
        ) TO '{nd_dir}/documents.parquet' (FORMAT PARQUET)
    """)
    planted = {
        int(r[0])
        for r in con.execute(
            f"""SELECT doc_id FROM '{dirs["sfx10"]}/documents.parquet'
                WHERE doc_id % 20 = 0 AND len(string_split(text, ' ')) >= 30"""
        ).fetchall()
    }
    nd_docs = load_table(spark, nd_dir, "documents")
    found_pairs = {
        (int(r["src"]), int(r["dst"]))
        for r in dedup.minhash_dedup_pairs(nd_docs, 0.5)
        .filter((F.col("src") % 50000000).isin(list(planted)))
        .collect()
    }
    hits = sum(
        1 for d in planted
        if (d, d + 50000000) in found_pairs or (d + 50000000, d) in found_pairs
    )
    rec = hits / len(planted) if planted else 1.0
    record("minhash_planted_neardup_recall", rec, 0.95, rec >= 0.95,
           time.perf_counter() - t,
           note=f"{hits}/{len(planted)} planted near-copies recovered")
    spark.catalog.clearCache()

    # 7. cosine_topk_lsh oracle parity where every bucket is over cap
    t = time.perf_counter()
    probs = compare(spark, "cosine_topk_lsh", dirs["sflsh25"])
    record("lsh_oracle_overcap_parity", len(probs), 0, not probs,
           time.perf_counter() - t,
           note=probs[0][:160] if probs else "bit-identical at 25k vectors")
    spark.catalog.clearCache()

    # 8-9. dup-heavy SKEWED 650k corpus (r09, verdict r08 #3): 120k
    # clique bases ×5 reps + a 50k near-identical mega-cluster. Keyed
    # volume 650k×4 bands = 2.6M rows overflows the 32-partition
    # session default, so _lsh_shuffle_partitions fires (recorded in
    # the note); the mega bucket is over cap in every band, so its
    # contribution to the eps graph is the documented chain contract
    # (mega-1 pairs), while every clique pair must be enumerated
    # EXACTLY — the analytic-truth equality the 2M receipts used, now
    # a committed gate with skew.
    n_bases, reps, mega = 120_000, 5, 50_000
    ids, mat = _load_vectors(dirs["sfclique"])
    n_all = len(ids)
    n_normal = n_bases * reps
    cl_emb = load_table(spark, dirs["sfclique"], "embeddings")
    sized_sp = similarity._lsh_shuffle_partitions(cl_emb, n_all * 4)

    t = time.perf_counter()
    step = max(1, n_normal // 400)
    probe_idx = np.arange(0, n_normal, step)[:400]
    gt_topk, _ = _exact_gt(ids, mat, probe_idx, k=reps - 1, eps=0.9)
    probe_ids = set(gt_topk)
    topk = similarity.similarity_topk_auto(cl_emb, "vec_id", "embedding", k=reps - 1)
    rows = topk.filter(F.col("src").isin(list(probe_ids))).collect()
    rec = _recall_topk(rows, gt_topk, k=reps - 1)
    record("dup_heavy_650k_topk_recall", rec, 0.95, rec >= 0.95,
           time.perf_counter() - t,
           note=f"{n_all} rows; sized shuffle partitions={sized_sp}")
    spark.catalog.clearCache()

    t = time.perf_counter()
    n_eps = similarity.eps_neighborhood_pairs(
        cl_emb, "vec_id", "embedding", threshold=0.9
    ).count()
    want = n_bases * (reps * (reps - 1) // 2) + (mega - 1)
    record("dup_heavy_650k_eps_exact", n_eps, want, n_eps == want,
           time.perf_counter() - t,
           note=f"analytic: {n_bases}xC({reps},2) cliques + {mega - 1} chain; "
                f"sized shuffle partitions={sized_sp}")
    spark.catalog.clearCache()

    # 10. simhash ABOVE its 200k route boundary (r09 width fix — the
    # pre-fix banding split a 64-bit range over 31-bit signatures, so
    # three bands were constant-zero and the "scale" plan was an
    # all-pairs join ×3). ×20 word-prefixed replicas of the 25k sfx10
    # docs (disjoint shingle spaces) + planted near-copies (last 2
    # tokens dropped) → 518.5k docs; the banded route fires NATURALLY
    # (n > SIMHASH_ALLPAIRS_MAX_ROWS, width inferred 62). Pigeonhole
    # is exact, so the planted pairs the operator returns must EQUAL
    # the numpy hamming≤6 GT on the planted subset — no floor, set
    # equality — and the text-level radius yield must stay ≥0.9.
    t = time.perf_counter()
    sim_dir = f"{GATE_DIR}/sfsim"
    os.makedirs(sim_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          WITH reps AS (SELECT unnest(range(20)) AS k),
          base AS (SELECT doc_id, text, lang, source, n_chars
                   FROM '{dirs["sfx10"]}/documents.parquet'),
          expanded AS (
            SELECT b.doc_id + k*10000000 AS doc_id,
                   'r' || k || replace(b.text, ' ', ' r' || k) AS text,
                   lang, source, n_chars
            FROM base b, reps
          )
          SELECT * FROM expanded
          UNION ALL
          SELECT doc_id + 500000000 AS doc_id,
                 array_to_string(string_split(text,' ')[1:len(string_split(text,' '))-2],
                                 ' ') AS text,
                 lang, source, n_chars
          FROM expanded
          WHERE (doc_id % 10000000) % 20 = 0
            AND len(string_split(text,' ')) >= 30
        ) TO '{sim_dir}/documents.parquet' (FORMAT PARQUET)
    """)
    sim_docs = load_table(spark, sim_dir, "documents")
    sim_sigs = dedup.simhash_signatures(
        dedup.shingle_ids(dedup.doc_shingles(sim_docs, distinct=False)), bits=62
    ).persist()
    sim_pairs = dedup.simhash_neardup_pairs(sim_sigs, 6)  # natural route: banded
    n_total_pairs = sim_pairs.count()
    found = {
        (int(r["src"]), int(r["dst"]))
        for r in sim_pairs.filter(
            F.col("dst") - F.col("src") == 500_000_000
        ).collect()
    }
    smap = {
        int(r["doc_id"]): int(r["simhash"])
        for r in sim_sigs.filter(
            (F.col("doc_id") >= 500_000_000)
            | ((F.col("doc_id") % 10_000_000) % 20 == 0)
        ).collect()
    }
    want_pairs = {
        (d - 500_000_000, d)
        for d, s in smap.items()
        if d >= 500_000_000 and (d - 500_000_000) in smap
        and bin(s ^ smap[d - 500_000_000]).count("1") <= 6
    }
    n_copies = sum(1 for d in smap if d >= 500_000_000)
    ok = found == want_pairs and len(want_pairs) >= 0.9 * n_copies
    record("simhash_wide_518k_planted", len(found), len(want_pairs), ok,
           time.perf_counter() - t,
           note=f"{n_total_pairs} total pairs at 518.5k docs; GT equality on "
                f"{len(want_pairs)}/{n_copies} in-radius planted copies")
    sim_sigs.unpersist()

    # 12. MinHash mega-bucket cap at corpus scale (r09, landed with only
    # 6-entry parity at sf sizes): 540k docs where 40k are near-copies
    # of ONE template — the boilerplate-page pathology. Uncapped, the
    # template bucket would collect_set 40k ids into one agg task and
    # explode C(40k,2) = 800M candidate pairs; with the cap it must
    # route through the b−1 window chain. Three properties gate:
    # bounded output (no 800M blow-up), template-cluster CONNECTIVITY
    # preserved through the chain (one CC over the emitted pairs — the
    # property downstream neardup_clusters depends on), and planted
    # near-copy recall elsewhere unaffected (small buckets are
    # byte-identical to the uncapped plan).
    t = time.perf_counter()
    from bigdataamazon_spark.operators.graph import connected_components

    tmpl_dir = f"{GATE_DIR}/sftemplate"
    dirs["sftemplate"] = tmpl_dir
    os.makedirs(tmpl_dir, exist_ok=True)
    template = " ".join(f"t{i}" for i in range(120))
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          WITH reps AS (SELECT unnest(range(20)) AS k),
          expanded AS (
            SELECT b.doc_id + k*10000000 AS doc_id,
                   'q' || k || replace(b.text, ' ', ' q' || k) AS text,
                   lang, source, n_chars
            FROM '{dirs["sfx10"]}/documents.parquet' b, reps
          )
          SELECT * FROM expanded
          UNION ALL
          SELECT 600000000 + k AS doc_id,
                 '{template} u' || k || ' w' || k AS text,
                 'en' AS lang, 'tmpl' AS source, 0 AS n_chars
          FROM range(40000) t(k)
          UNION ALL
          SELECT doc_id + 1000000000 AS doc_id,
                 array_to_string(string_split(text,' ')[1:len(string_split(text,' '))-2],
                                 ' ') AS text,
                 lang, source, n_chars
          FROM expanded
          WHERE (doc_id % 10000000) % 40 = 0
            AND len(string_split(text,' ')) >= 30
        ) TO '{tmpl_dir}/documents.parquet' (FORMAT PARQUET)
    """)
    planted = {
        int(r[0])
        for r in con.execute(f"""
            SELECT doc_id FROM '{tmpl_dir}/documents.parquet'
            WHERE doc_id >= 1000000000""").fetchall()
    }
    tmpl_docs = load_table(spark, tmpl_dir, "documents")
    capped = dedup.minhash_dedup_pairs(
        tmpl_docs, 0.5, max_bucket_size=500
    ).persist()
    n_pairs = capped.count()
    tmpl_edges = capped.filter(
        (F.col("src") >= 600_000_000) & (F.col("src") < 1_000_000_000)
        & (F.col("dst") >= 600_000_000) & (F.col("dst") < 1_000_000_000)
    )
    comp = connected_components(tmpl_edges)
    n_nodes = comp.count()
    n_comps = comp.select("label").distinct().count()
    found = {
        int(r["dst"])
        for r in capped.filter(
            F.col("dst") - F.col("src") == 1_000_000_000
        ).collect()
    }
    hits = sum(1 for d in planted if d in found)
    rec = hits / len(planted) if planted else 1.0
    capped.unpersist()
    # a ~0.06% tail of template docs falls out of the mega bucket in
    # every band (the doc's unique shingle hashes below a shared
    # minimum) — intrinsic LSH recall, identical under the uncapped
    # route, so membership gates at 99.8%, connectivity at exactly 1
    ok = (
        n_pairs < 5_000_000
        and n_nodes >= 39_800
        and n_comps == 1
        and rec >= 0.95
    )
    record("minhash_megabucket_540k", rec, 0.95, ok,
           time.perf_counter() - t,
           note=f"{n_pairs} pairs at 540k docs (uncapped template would be 800M); "
                f"template cluster: {n_nodes}/40000 nodes in {n_comps} component(s); "
                f"planted recall {hits}/{len(planted)}")
    spark.catalog.clearCache()

    n_fail = sum(1 for c in checks.values() if not c["pass"])
    result = {
        "gate": "scale-correctness",
        "corpora": dirs,
        "checks": checks,
        "n_fail": n_fail,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 1 if n_fail else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", action="store_true")
    ap.add_argument("--out", default=None, help="also write gate JSON here")
    ap.add_argument("rest", nargs="*")
    args = ap.parse_args()
    if args.gate:
        return _gate(args.out)
    if len(args.rest) < 2:
        ap.error("timing mode needs: SF_DIR QUERY [QUERY...]")
    _timing_mode(args.rest[0], args.rest[1:])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
