"""Driver-harness parity: every Spark query ≡ its DuckDB oracle at sf0.001.

Mimics the driver's CORRECTNESS check (row count + column names + order-
insensitive value comparison) so regressions surface here first.
"""

import math
import os

import duckdb
import pytest

from logtemplatecrawler_spark.plans.harness import ORACLES, QUERIES

SF_DIR = os.environ.get("HARNESS_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, cols):
    """Sort columns by name, canonicalize cell values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                vals.append(("b", v))
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append(("f", "nan"))
                else:
                    vals.append(("f", round(v, 9)))
            else:
                vals.append(("v", v))
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    assert _normalize(srows, scols) == _normalize(drows, dcols), f"{name}: values differ"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Queries without a SQL oracle must at least run, be deterministic
    across two executions, and return a stable schema."""
    df1 = QUERIES[name](spark, SF_DIR)
    df2 = QUERIES[name](spark, SF_DIR)
    r1 = sorted(repr(tuple(r)) for r in df1.collect())
    r2 = sorted(repr(tuple(r)) for r in df2.collect())
    assert df1.columns == df2.columns
    assert r1 == r2
    assert len(r1) > 0


def test_mm_frame_sample_non_ascii(spark, tmp_path):
    """Frames are CHARACTER slices on both engines: a non-ASCII corpus must
    agree in frame count and frame_sig (ADVICE r02 — the pandas stage used
    to slice utf-8 bytes while DuckDB substr slices characters)."""
    rows = [
        (1, "héllo wörld — naïve café " * 8),
        (2, "日本語のテキストです。" * 15),
        (3, "plain ascii words only here " * 5),
        (4, "mixed ascii → ünïcode ↔ text " * 6),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(1) \
        .write.parquet(d + "/documents.parquet")
    sdf = QUERIES["mm_frame_sample"](spark, d)
    srows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    drows = sorted(tuple(r) for r in con.execute(ORACLES["mm_frame_sample"]).fetchall())
    con.close()
    assert len(srows) > 4
    assert srows == drows


def test_lsh_tuned_s_curve(spark):
    """Property test (VERDICT r02 item 7): the threshold-parameterized LSH
    candidates follow the banding S-curve against EXACT bigram-shingle
    Jaccard on the bounded doc_id<200 slice — identical pairs are always
    candidates (s=1 ⇒ every band agrees, a theorem), pairs well above the
    τ=0.7 target are mostly candidates, pairs well below mostly are not."""
    from logtemplatecrawler_spark.operators.minhash import (
        candidate_probability, lsh_banding,
    )
    from logtemplatecrawler_spark.plans.harness import (
        _TUNED_PERMS, _TUNED_THRESHOLD,
    )

    bands, rows = lsh_banding(_TUNED_PERMS, _TUNED_THRESHOLD)
    assert bands * rows == _TUNED_PERMS
    assert abs((1 / bands) ** (1 / rows) - _TUNED_THRESHOLD) < 0.05
    assert candidate_probability(1.0, bands, rows) == 1.0

    # exact shingle Jaccard, pure python (the exactness oracle)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
        " WHERE doc_id < 200"
    ).fetchall()
    con.close()
    shingle_sets = {}
    for doc_id, text in docs:
        ws = text.split(" ")
        if len(ws) >= 2:
            shingle_sets[doc_id] = {f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)}
    ids = sorted(shingle_sets)
    exact = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(shingle_sets[a] & shingle_sets[b])
            if inter:
                exact[(a, b)] = inter / len(shingle_sets[a] | shingle_sets[b])

    cand = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_lsh_pairs_tuned"](spark, SF_DIR).collect()
        if r["doc_a"] < 200 and r["doc_b"] < 200
    }
    # fixture near-dups sit at s∈[0.9, 0.99]; everything else at s ≤ ~0.15
    high = {p for p, s in exact.items() if s >= 0.9}
    low = {p for p, s in exact.items() if s <= 0.3}
    assert high and high <= cand  # full recall above τ (P≥0.998 per pair)
    assert low and len(cand & low) / len(low) <= 0.01  # ~no candidates below τ

    # COMPOSED path (VERDICT r04 item 2): LSH candidates → exact verify →
    # clustering.  Every exact-Jaccard ≥ 0.9 pair must share a cluster;
    # every ≤ 0.3 pair must be separated (the τ=0.7 verify kills any LSH
    # false positive before it can merge clusters); each cluster's label is
    # its min member, which is the one canonical.
    labels = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in QUERIES["dedup_lsh_cluster_canonical"](spark, SF_DIR).collect()
    }
    assert all(labels[a][0] == labels[b][0] for a, b in high)
    assert all(labels[a][0] != labels[b][0] for a, b in low)
    clusters = {}
    for doc_id, (cid, canon) in labels.items():
        clusters.setdefault(cid, []).append((doc_id, canon))
        assert canon == (doc_id == cid)
    for cid, members in clusters.items():
        assert cid == min(d for d, _ in members)
        assert sum(c for _, c in members) == 1


def test_multiprobe_recall_monotone(spark):
    """VERDICT r04 item 4: widening the probe set (LSH single bucket →
    Hamming-1 multiprobe; IVF nprobe 1 → 2) yields a candidate SUPERSET,
    so recall@10 against the brute-force cosine oracle can only grow — a
    true-top-10 vector in the narrow result can only be displaced by
    higher-cosine vectors, of which there are at most 9 globally."""
    truth = [
        r["vec_id"]
        for r in QUERIES["ann_cosine_topk"](spark, SF_DIR).collect()
    ][:10]

    def recall(name):
        got = {r["vec_id"] for r in QUERIES[name](spark, SF_DIR).collect()}
        return len(got & set(truth)) / len(truth)

    lsh1 = recall("ann_lsh_bucket_search")
    lsh5 = recall("ann_lsh_multiprobe_search")
    ivf1 = recall("ann_ivf_search")
    ivf2 = recall("ann_ivf_search_nprobe2")
    assert lsh5 >= lsh1
    assert ivf2 >= ivf1
    assert lsh5 > 0 and ivf2 > 0  # the probes actually find true neighbors
    # the Lloyd-trained codebook changes cell boundaries, so its recall is
    # not ordered vs the seed codebook — but a trained probe must still
    # surface true neighbors (a recall-0 result would mean training broke
    # the cell containing the query's neighborhood)
    assert recall("ann_ivf_search_trained") > 0


def test_connected_components_one_job_per_iteration(spark):
    """VERDICT r04 item 6: the clustering loop runs ONE Spark job per
    iteration — the changed-row count rides the lazily-checkpointed
    propagation frame instead of a second join+count job.  Measured with
    AQE off (adaptive stage materialization splits one action into several
    bookkeeping jobs); the old two-action loop would need ≥ 2·iters + 3
    jobs here.  r6: the loop path is FORCED via ``local_max=0`` — by
    default a graph this small is resolved by the single-task union-find
    endgame and never reaches the loop (covered by
    test_cc_local_endgame_matches_loop below)."""
    from pyspark.sql import functions as F

    from logtemplatecrawler_spark.operators.components import (
        connected_components,
    )

    sc = spark.sparkContext
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # a path graph maximizes iterations (label 0 travels one hop/round)
        nodes = spark.range(8).select(F.col("id").alias("doc_id"))
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(7)], "doc_a long, doc_b long"
        )
        sc.setJobGroup("cc-jobs", "cc one-job-per-iteration probe")
        labels, iters = connected_components(nodes, pairs, local_max=0)
        got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert got == {i: 0 for i in range(8)}
    # r5: pointer jumping + edge contraction turn the 7-hop path (plain
    # hash-min: 8 rounds) into O(log diameter) rounds
    assert iters <= 5, iters
    jobs = len(sc.statusTracker().getJobIdsForGroup("cc-jobs"))
    # r5 accounting: per round, ONE change-count job plus at most one job
    # materializing the lazily-checkpointed contracted edge table (the r4
    # redundant join+count bookkeeping job stays gone); plus setup
    # checkpoints, the star count and the final collect.  The contraction
    # trades ≤1 extra SHRINKING-edge job per round for O(log d) rounds
    # instead of d.
    assert jobs <= 2 * iters + 5, jobs

    # the cap raises instead of returning partial labels
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, pairs, max_iters=1, local_max=0)


def test_cc_local_endgame_matches_loop(spark):
    """r6: when the contracted star set fits ``local_max``, the single-task
    union-find endgame must produce EXACTLY the labels the distributed
    loop produces — same adversarial multi-partition graph, both paths."""
    from pyspark.sql import functions as F

    from logtemplatecrawler_spark.operators.components import (
        connected_components,
    )

    raw = (
        [(i, i + 1) for i in range(30)]
        + [(100 + i, 100 + j) for i in range(5) for j in range(i)]
        + [(30, 100), (200, 201)]
    )
    nodes = sorted({n for e in raw for n in e} | {998, 999})
    pairs = spark.createDataFrame(raw, "doc_a long, doc_b long").repartition(8)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    fast, fast_iters = connected_components(nodes_df, pairs)
    slow, _ = connected_components(nodes_df, pairs, local_max=0)
    fast_map = {r["doc_id"]: r["cluster_id"] for r in fast.collect()}
    slow_map = {r["doc_id"]: r["cluster_id"] for r in slow.collect()}
    assert fast_map == slow_map
    assert fast_iters == 1  # endgame path: no distributed rounds
    assert fast_map[999] == 999 and fast_map[998] == 998  # singletons


def test_intersect_counts_matches_join_count():
    """r6: the binary-search verify kernel must replicate the r5
    join-count semantics exactly — Σ_hw cnt_a(hw)·cnt_b(hw) — INCLUDING
    duplicate hashes on either side (the md5-prefix-collision corner the
    relational join counts multiplicatively)."""
    from collections import Counter

    import pandas as pd

    from logtemplatecrawler_spark.operators.jaccard import intersect_counts

    cases = [
        ([1, 2, 3], [2, 3, 4]),            # plain overlap
        ([1, 1, 2], [1, 3]),               # dup on a: 2·1 = 2 matches
        ([5, 5], [5, 5, 5]),               # dup both: 2·3 = 6 matches
        ([], [1, 2]),                      # empty side
        ([7], [8]),                        # disjoint
        (list(range(100)), list(range(50, 150))),  # long overlap
    ]
    pdf = pd.DataFrame({
        "doc_a": range(len(cases)),
        "doc_b": range(len(cases)),
        "hwa": [sorted(a) for a, _ in cases],
        "hwb": [sorted(b) for _, b in cases],
    })
    (out,) = list(intersect_counts(iter([pdf])))
    for j, (a, b) in enumerate(cases):
        ca, cb = Counter(a), Counter(b)
        expect = sum(ca[h] * cb[h] for h in ca)
        assert out["i"][j] == expect, (j, a, b)
        assert out["na"][j] == len(a) and out["nb"][j] == len(b)


def test_local_contract_preserves_components(spark):
    """r6: the per-partition union-find pre-contraction emits, per
    partition, one (node, local-min) star edge per non-root node; the union
    of those stars must connect exactly what the raw edges connected, for
    ANY partitioning of the edge set.  Checked on an adversarial mix (long
    path + cliques + singleton bridge) forced into many tiny partitions so
    every component straddles partition boundaries, against a pure-Python
    union-find oracle; labels and iteration count both verified (the loop
    must still converge on the contracted forest)."""
    from pyspark.sql import functions as F

    from logtemplatecrawler_spark.operators.components import (
        connected_components,
    )

    raw = (
        [(i, i + 1) for i in range(40)]                      # path 0..40
        + [(100 + i, 100 + j) for i in range(6) for j in range(i)]  # clique
        + [(40, 100)]                                        # bridge
        + [(200, 201), (202, 201)]                           # small star
    )
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in raw:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({n for e in raw for n in e} | {999})       # 999: singleton
    truth = {n: find(n) for n in nodes}

    pairs = spark.createDataFrame(raw, "doc_a long, doc_b long").repartition(16)
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    labels, iters = connected_components(nodes_df, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == truth, (got, truth)
    # contracted path of ~16 super-nodes + pointer jumping: O(log) rounds
    assert iters <= 8, iters


def test_kmeans_refine_lloyd_monotone(spark):
    """`ann_ivf_kmeans_refine` is one true Lloyd step: recomputing
    centroids as assigned-cluster means and re-assigning cannot increase
    the k-means objective (means minimize within-cluster squared distance;
    argmin re-assignment only lowers it further).  Verified numerically
    against the raw embeddings with the query's own labels."""
    import numpy as np
    import pandas as pd

    rows = QUERIES["ann_ivf_kmeans_refine"](spark, SF_DIR).collect()
    lab = {r["vec_id"]: (r["centroid0"], r["centroid"], r["moved"]) for r in rows}
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    X = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
         for r in emb.itertuples()}
    assert set(lab) == set(X)
    for vid, (c0, c1, moved) in lab.items():
        assert 0 <= c0 < 8 and 0 <= c1 < 8
        assert moved == (c0 != c1)

    def means(label_ix):
        cents = {}
        for vid, x in X.items():
            cents.setdefault(lab[vid][label_ix], []).append(x)
        return {k: np.mean(v, axis=0) for k, v in cents.items()}

    cents0 = {k: np.mean([x for vid, x in X.items() if vid % 8 == k], axis=0)
              for k in range(8)}
    cents1 = means(0)  # means of the seed-assignment clusters
    j_before = sum(np.sum((X[v] - cents0[lab[v][0]]) ** 2) for v in X)
    j_after = sum(np.sum((X[v] - cents1[lab[v][1]]) ** 2) for v in X)
    assert j_after <= j_before + 1e-9
    # sanity: the seed assignment itself already beats the mod-8 partition
    j_mod8 = sum(np.sum((X[v] - cents0[v % 8]) ** 2) for v in X)
    assert j_before <= j_mod8 + 1e-9


def test_embedding_cluster_consistency(spark):
    """`dedup_embedding_cosine_canonical` composes the cosine-pair
    generator into connected components: every qualifying pair shares a
    cluster, each cluster is labeled by its min member, and exactly one
    member per cluster is canonical."""
    pairs = [
        (r["vec_a"], r["vec_b"])
        for r in QUERIES["dedup_embedding_cosine_pairs"](spark, SF_DIR).collect()
    ]
    labels = {
        r["vec_id"]: (r["cluster_id"], r["is_canonical"])
        for r in QUERIES["dedup_embedding_cosine_canonical"](spark, SF_DIR).collect()
    }
    assert len(labels) == 300  # every node in the slice, singletons included
    assert pairs, "fixture slice must contain near-dup pairs"
    for a, b in pairs:
        assert labels[a][0] == labels[b][0]
    clusters = {}
    for vid, (cid, canon) in labels.items():
        clusters.setdefault(cid, []).append((vid, canon))
        assert canon == (vid == cid)
    for cid, members in clusters.items():
        assert cid == min(v for v, _ in members)
        assert sum(c for _, c in members) == 1


def test_simhash_banding_exactly_complete(spark):
    """The banded simhash pair generator must equal brute-force all-pairs
    Hamming ≤ 3 — the pigeonhole claim (4 bands of 15 bits; ≤ 3 differing
    bits cannot touch all 4 bands) made in `dedup_simhash_hamming_pairs`.
    The DuckDB oracle uses the SAME banding constants, so this test is the
    independent completeness check the hash-compare cannot provide."""
    from logtemplatecrawler_spark.plans.harness import (
        _SIMHASH_HAMMING, _simhash_frame,
    )

    sims = {
        r["doc_id"]: r["simhash"]
        for r in _simhash_frame(spark, SF_DIR).collect()
    }
    ids = sorted(sims)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sims[a] ^ sims[b]).count("1") <= _SIMHASH_HAMMING
    }
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_simhash_hamming_pairs"](spark, SF_DIR).collect()
    }
    assert brute, "fixture corpus must contain simhash near-dups"
    assert banded == brute


def test_lsh_capped_subset(spark):
    """The mega-bucket cap only ever REMOVES candidates: capped pairs are
    a strict subset of the tuned (uncapped) pairs at fixture scale (the
    fixture has exactly one oversized band bucket, so strictness proves
    the guard actually fired), and every surviving pair still comes from
    some within-cap band bucket."""
    tuned = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_lsh_pairs_tuned"](spark, SF_DIR).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["dedup_lsh_pairs_capped"](spark, SF_DIR).collect()
    }
    assert capped <= tuned
    assert capped < tuned, "cap did not fire — fixture bucket sizes changed?"


def test_pq_adc_matches_numpy_oracle(spark):
    """IVF-PQ entry vs an independent numpy oracle (not DuckDB): codebook =
    per-coordinate means of vec_id%8 classes, codes = per-subspace argmin
    (round-6 then ties by k, the entry's stability rule), candidates = the
    query's coarse cell, ADC = summed per-subspace LUT entries.  Pins the
    algorithm itself, not just cross-SQL agreement."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    vec_ids = np.asarray(tbl["vec_id"])
    X = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    order = np.argsort(vec_ids)
    vec_ids, X = vec_ids[order], X[order]
    K, M = 8, 8
    cents = np.stack([X[vec_ids % K == k].mean(axis=0) for k in range(K)])
    sub = np.arange(X.shape[1]) % M  # round-robin subspaces
    # coarse assignment (full-dim), round-6 then argmin with k tie-break
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    coarse = np.round(d2, 6).argmin(axis=1)
    q = X[vec_ids == 0][0]
    cand = (coarse == coarse[vec_ids == 0][0]) & (vec_ids != 0)
    # PQ codes + query LUT per subspace
    adc = np.zeros(len(X))
    for m in range(M):
        cols = sub == m
        sd2 = ((X[:, None, cols] - cents[None, :, cols]) ** 2).sum(axis=2)
        codes_m = np.round(sd2, 6).argmin(axis=1)
        lut = ((q[cols] - cents[:, cols]) ** 2).sum(axis=1)
        adc += lut[codes_m]
    cand_ids = vec_ids[cand]
    cand_adc = np.round(adc[cand], 6)
    expect = sorted(zip(cand_adc, cand_ids))[:10]
    got = [
        (r["adc"], r["vec_id"])
        for r in QUERIES["ann_ivfpq_search"](spark, SF_DIR).collect()
    ]
    assert [(round(a, 6), v) for a, v in expect] == \
        [(round(a, 6), v) for a, v in got]


def test_winnow_guarantee_shared_substring_shares_fingerprint(spark):
    """THE winnowing guarantee (Schleimer et al. §3): any two docs sharing
    a common substring of length ≥ k+w−1 (= 23 chars here) MUST share at
    least one selected fingerprint — the selection rule may thin grams but
    can never lose a long match.  Verified end-to-end against a pure-Python
    23-gram index over the same slice."""
    import collections

    import pyarrow.parquet as pq

    k, w = 8, 16
    t = k + w - 1
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = {
        did: text
        for did, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
        if did < 200 and len(text) >= t
    }
    gram_owners = collections.defaultdict(set)
    for did, text in docs.items():
        for p in range(len(text) - t + 1):
            gram_owners[text[p:p + t]].add(did)
    must_share = {
        (a, b)
        for owners in gram_owners.values() if len(owners) > 1
        for a in owners for b in owners if a < b
    }
    assert must_share, "fixture corpus must contain ≥23-char shared substrings"
    fps = collections.defaultdict(set)
    for r in QUERIES["text_winnow_fingerprint"](spark, SF_DIR).collect():
        fps[r["doc_id"]].add(r["fp"])
    for a, b in must_share:
        assert fps[a] & fps[b], f"pair ({a},{b}) shares a {t}-gram but no fingerprint"


def test_seed_ingest_canonical_invariants(spark):
    """The canonicalized frontier rows carry no fragment, no default port,
    no trailing slash, a lowercase authority — and the duplicate seed
    variant actually collapsed (fewer rows than seeds) to max priority."""
    rows = QUERIES["crawl_seed_ingest_canonicalize"](spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(rows) < n_docs  # variant-4 duplicates collapsed
    seen_pathcase = False
    for r in rows:
        url = r["url"]
        assert "#" not in url and not url.endswith("/")
        assert ":80/" not in url and ":443/" not in url
        scheme_auth = url.split("/path/")[0].split("/p/")[0].split("/P/")[0]
        assert scheme_auth == scheme_auth.lower()
        assert r["host"] in url
        if "/P/" in url:
            seen_pathcase = True  # path case preserved while authority lowered
    assert seen_pathcase


def test_semantic_cluster_consistency(spark):
    """`dedup_semantic_clustered_canonical` runs the WHOLE embedding table
    through IVF-cell-bounded pair generation + connected components: every
    vector labeled, labels are component minima, one canonical per cluster,
    and the cell restriction only ever DROPS pairs relative to the exact
    bounded-slice generator (candidates that straddle a cell boundary)."""
    labels = {
        r["vec_id"]: (r["cluster_id"], r["is_canonical"])
        for r in QUERIES["dedup_semantic_clustered_canonical"](spark, SF_DIR).collect()
    }
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(labels) == n_vecs
    merged = {v for v, (c, _) in labels.items() if c != v}
    assert merged, "fixture must produce non-singleton semantic clusters"
    clusters = {}
    for vid, (cid, canon) in labels.items():
        assert cid <= vid
        assert canon == (vid == cid)
        clusters.setdefault(cid, 0)
        clusters[cid] += int(canon)
    assert all(n == 1 for n in clusters.values())
    # cell-bounded pairs ⊆ exact pairs: any two docs the semantic path
    # merged DIRECTLY must be a genuine cosine pair when both sit in the
    # exact slice (cluster transitivity means same-cluster is necessary,
    # not sufficient, so check the slice's exact pairs imply same cluster)
    exact = QUERIES["dedup_embedding_cosine_pairs"](spark, SF_DIR).collect()
    same_cell = {
        r["vec_id"]: r["centroid"]
        for r in QUERIES["ann_ivf_assign"](spark, SF_DIR).collect()
    }
    for r in exact:
        a, b = r["vec_a"], r["vec_b"]
        if same_cell[a] == same_cell[b]:
            assert labels[a][0] == labels[b][0], (
                f"in-cell exact pair ({a},{b}) not merged by semantic path"
            )


def test_pack_sequences_invariants(spark):
    """Packing must be a consistent streaming concat per shard: offsets in
    [0, target), chunk ids non-decreasing in doc order, and each doc's
    start equals the running token sum of its shard predecessors."""
    rows = QUERIES["curation_pack_sequences"](spark, SF_DIR).collect()
    target = 512
    by_shard = {}
    for r in rows:
        assert 0 <= r["chunk_offset"] < target
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 8
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["doc_id"])
        running = 0
        last_chunk = 0
        for r in docs:
            assert r["chunk_id"] * target + r["chunk_offset"] == running
            assert r["chunk_id"] >= last_chunk
            last_chunk = r["chunk_id"]
            running += r["n_tokens"]


def test_split_assign_content_stable(spark):
    """Split assignment keys on content: identical text ⇒ identical split;
    buckets live in [0,100); split names agree with bucket thresholds; and
    the train fraction dominates (96/2/2 design)."""
    rows = QUERIES["curation_split_assign"](spark, SF_DIR).collect()
    n = len(rows)
    counts = {"train": 0, "val": 0, "test": 0}
    for r in rows:
        assert 0 <= r["bucket"] < 100
        want = ("test" if r["bucket"] >= 98 else
                "val" if r["bucket"] >= 96 else "train")
        assert r["split"] == want
        counts[r["split"]] += 1
    assert counts["train"] > 0.8 * n
    # determinism: a second run assigns identically
    again = {r["doc_id"]: r["split"]
             for r in QUERIES["curation_split_assign"](spark, SF_DIR).collect()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)


def test_lm_bigram_score_branches(spark, duck):
    """The LM scorer must (a) score every held-out transition exactly once,
    (b) produce strictly negative log-mass, and (c) actually exercise the
    backoff branches on the fixtures — otherwise the hash never pins the
    backoff rule (constants tuned so both unseen-bigram and OOV branches
    fire at sf0.001 and sf0.01)."""
    rows = {r["doc_id"]: r for r in
            QUERIES["text_lm_bigram_score"](spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").collect()
    for d in docs:
        if d["doc_id"] % 50 == 1:
            assert d["doc_id"] not in rows  # train docs are not scored
            continue
        r = rows[d["doc_id"]]
        assert r["n_scored"] == len(d["text"].split(" ")) - 1
        assert r["sum_lp_micro"] < 0
    # branch coverage, measured with the oracle's own constants
    branches = duck.execute("""
        WITH words AS (
          SELECT doc_id, generate_subscripts(string_split(text,' '),1) AS pos,
                 unnest(string_split(text,' ')) AS w FROM documents
        ), toks AS (
          SELECT doc_id, w, lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
          FROM words
        ), uni AS (
          SELECT w, count(*) AS c1 FROM words WHERE doc_id % 50 = 1 GROUP BY w
        ), big AS (
          SELECT prev, w, count(*) AS c2 FROM toks
          WHERE prev IS NOT NULL AND doc_id % 50 = 1 GROUP BY 1, 2
        )
        SELECT count(*) FILTER (b.c2 IS NULL AND uw.c1 IS NOT NULL) AS backoff,
               count(*) FILTER (uw.c1 IS NULL) AS oov
        FROM toks t
        LEFT JOIN big b ON b.prev = t.prev AND b.w = t.w
        LEFT JOIN uni uw ON uw.w = t.w
        WHERE t.prev IS NOT NULL AND t.doc_id % 50 <> 1
    """).fetchone()
    assert branches[0] > 0, "unseen-bigram backoff never fired"
    assert branches[1] > 0, "OOV fallback never fired"


def test_pii_scrub_redacts(spark):
    """Scrubbing must remove every lexicon hit: the redacted fingerprint of
    a doc with hits differs from the raw md5, n_hits counts matches, and a
    manual Python re replay reproduces the engine fingerprints."""
    import hashlib
    import re

    rows = {r["doc_id"]: r for r in
            QUERIES["text_pii_scrub"](spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").collect()
    pat = re.compile(r"\b(customer|value)\b")
    hit_docs = 0
    for d in docs:
        r = rows[d["doc_id"]]
        expect = pat.sub("<SCRUBBED>", d["text"])
        assert r["n_hits"] == len(pat.findall(d["text"]))
        assert r["red_fp"] == hashlib.md5(expect.encode()).hexdigest()
        if r["n_hits"]:
            hit_docs += 1
            assert "customer" not in expect.replace("<SCRUBBED>", "")
    assert hit_docs > 0, "fixture lexicon never matched — scrub untested"


def test_repetition_stats_match_python_replay(spark):
    """The Gopher-style repetition numerators/denominators must equal an
    exact Python recount per document."""
    rows = {r["doc_id"]: r for r in
            QUERIES["text_repetition_stats"](spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").collect()
    assert len(rows) == len(docs)
    for d in docs:
        ws = d["text"].split(" ")
        r = rows[d["doc_id"]]
        assert r["n_tokens"] == len(ws)
        assert r["n_distinct_words"] == len(set(ws))
        counts = {}
        for w_ in ws:
            counts[w_] = counts.get(w_, 0) + 1
        assert r["top_word_count"] == max(counts.values())
        assert r["n_distinct_bigrams"] == len(set(zip(ws, ws[1:])))


def test_domain_mix_sample_balanced(spark):
    """Stratified downsampling must emit EXACTLY quota rows per language
    (quota = smallest language's count), with ranks 1..quota, and must be
    reproducible."""
    rows = QUERIES["curation_domain_mix_sample"](spark, SF_DIR).collect()
    lang_counts = {
        r["lang"]: r["c"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("lang").count().withColumnRenamed("count", "c").collect()
    }
    q = min(lang_counts.values())
    assert max(lang_counts.values()) > q, "fixture must be lang-skewed"
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r["rnk"])
    assert set(per_lang) == set(lang_counts)
    for lang, rnks in per_lang.items():
        assert sorted(rnks) == list(range(1, q + 1)), lang
    again = sorted((r["doc_id"], r["rnk"]) for r in
                   QUERIES["curation_domain_mix_sample"](spark, SF_DIR).collect())
    assert again == sorted((r["doc_id"], r["rnk"]) for r in rows)
