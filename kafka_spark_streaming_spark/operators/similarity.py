"""Similarity search over embeddings (north star, BASELINE.json:6).

Three tiers, one semantics:

1. `sim_topk_bruteforce` — baseline: broadcast the query set, score
   every candidate with a pure-Catalyst cosine (zip_with + aggregate,
   codegen'd), window top-k. This is already the right 100 TB plan for
   few queries × huge corpus: queries broadcast, corpus scanned once,
   per-partition partial top-k via the window's rank pushdown.
2. `sim_topk_blocked` — the same semantics through mapInPandas: each
   Arrow batch scores a (queries × batch) matrix with one numpy GEMM.
   At 64-dim × small k the JVM path wins; at 1024-dim+ the vectorized
   GEMM path wins — both are here, both oracle-checked to identical
   output.
3. `sim_ann_lsh` — approximate: random-hyperplane signs (deterministic
   seed) bucket the corpus; only same-bucket candidates are scored.
   Sub-linear candidate sets at scale; recall measured in tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_spark_streaming_spark.functions import cosine_similarity
from kafka_spark_streaming_spark.operators.registry import register
from kafka_spark_streaming_spark.tables import table

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 5

_TOPK_ORACLE = f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    scored AS (
      -- floor(s*1e9+0.5)/1e9 BEFORE ranking, same as the Spark side:
      -- collapses cross-engine float-sum noise (~1e-13) so near-tied
      -- cosines rank identically in both engines (floor is defined
      -- identically everywhere; round() tie-breaking is engine-specific)
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             floor(list_cosine_similarity(q.v, c.v) * 1e9 + 0.5) / 1e9 AS s
      FROM e q, e c
      WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, round(s, 6) AS score, rn AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
"""


# LSH hyperplanes are a fixed seed-42 draw shared by the Spark query AND
# its oracle: the SQL below embeds the same constants and recomputes the
# whole ANN pipeline (sign buckets → candidate equi-join → exact-cosine
# rerank → top-k) independently in DuckDB. Sign comparisons are robust
# to summation-order float differences (dot products are never within
# ulps of zero), so both engines bucket identically.
_LSH_TABLES, _LSH_PLANES_PER_TABLE, _LSH_DIM = 8, 4, 64


def _lsh_planes():
    import numpy as np

    return np.random.RandomState(42).randn(
        _LSH_TABLES, _LSH_PLANES_PER_TABLE, _LSH_DIM
    )


def lsh_bucket_cte() -> str:
    """SQL body of the sign-bucket CTE over ``e(vec_id, v)`` — shared
    by the ANN oracle here and the LSH-candidate dedup oracles in
    dedup.py, so both engines bucket with the same seed-42 planes."""
    planes = _lsh_planes()

    def bucket_expr(t: int) -> str:
        cases = []
        for p in range(_LSH_PLANES_PER_TABLE):
            consts = ", ".join(repr(float(x)) for x in planes[t, p])
            cases.append(
                f"(CASE WHEN list_dot_product(v, [{consts}]) > 0 "
                f"THEN {1 << p} ELSE 0 END)"
            )
        return " + ".join(cases)

    # Same fail-fast contract as lsh_buckets / lsh_buckets_arrow
    # (ADVICE r10): a null or ragged embedding is a data error in every
    # engine, never a silent bucket-0 row.
    guard = (
        f"CASE WHEN v IS NULL OR len(v) <> {_LSH_DIM} "
        f"THEN error('embedding dim != {_LSH_DIM}') ELSE 0 END"
    )
    return "\n      UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS t, {guard} + {bucket_expr(t)} AS bkt FROM e"
        for t in range(_LSH_TABLES)
    )


def lsh_buckets(e: DataFrame) -> DataFrame:
    """(vec_id, t, bkt) sign-bucket rows for every vector: one exploded
    row per LSH table, bucket = 4-bit sign pattern against the fixed
    seed-42 hyperplanes.  Pure Catalyst (zip_with/aggregate, codegen'd);
    the Spark twin of lsh_bucket_cte()."""
    planes = _lsh_planes()

    # Fail-fast on null/ragged embeddings, matching lsh_buckets_arrow's
    # ValueError and the oracle CTE's error() (ADVICE r10: the old
    # otherwise(0) silently bucketed a null embedding as 0 in every
    # table while the Arrow twin raised — the 'identical rows' contract
    # diverged on non-fixture data). raise_error stays in codegen.
    e = e.withColumn(
        "embedding",
        F.when(
            F.col("embedding").isNull()
            | (F.size("embedding") != _LSH_DIM),
            F.raise_error(F.lit(f"embedding dim != {_LSH_DIM}")),
        ).otherwise(F.col("embedding")),
    )

    def dot_plane(t: int, p: int) -> F.Column:
        return F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(float(x)) for x in planes[t, p]]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def bucket(t: int) -> F.Column:
        return sum(
            [
                F.when(dot_plane(t, p) > 0, F.lit(1 << p)).otherwise(F.lit(0))
                for p in range(_LSH_PLANES_PER_TABLE)
            ],
            F.lit(0),
        ).cast("int")

    return e.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), bucket(t).alias("bkt"))
                    for t in range(_LSH_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", F.col("tb.t").alias("t"), F.col("tb.bkt").alias("bkt"))


def lsh_buckets_arrow(e: DataFrame) -> DataFrame:
    """Arrow/numpy twin of lsh_buckets — identical (vec_id, t, bkt) rows,
    built with one (batch × 64) @ (64 × 32) matmul per Arrow batch
    instead of 32 interpreted higher-order dot folds per vector (HOFs
    are interpreted per ELEMENT, measured 3.2 s for 2000 vectors at
    sf0.1 vs ~0.1 s here).

    Correctness: buckets depend only on the SIGN of each plane dot.
    numpy's blocked summation rounds differently from the sequential
    fold / DuckDB's list_dot_product, but the smallest |dot| across all
    three fixtures is 2.3e-7 (measured r10) vs reorder noise ~1e-13·‖v‖
    — six orders of magnitude of margin, the same sign-robustness
    premise the cross-engine oracle already rests on. A test pins exact
    frame equality with lsh_buckets at the fixture SFs.

    100 TB posture: mapInArrow streams batches (never a per-row Python
    hop), the plane matrix is a 16 KB task constant, and output is
    8 rows/vector — the bucket build scans the corpus once."""
    import numpy as np
    import pyarrow as pa

    planes_t = (
        _lsh_planes()
        .reshape(_LSH_TABLES * _LSH_PLANES_PER_TABLE, _LSH_DIM)
        .T.copy()
    )  # (dim, tables*planes)
    weights = 1 << np.arange(_LSH_PLANES_PER_TABLE)

    def buckets(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            emb = batch.column("embedding")
            vals = np.asarray(emb.flatten(), dtype=np.float64)
            if vals.size != n * _LSH_DIM:  # ragged input: contract is
                raise ValueError("embedding dim != 64")  # fixed-dim
            signs = (vals.reshape(n, _LSH_DIM) @ planes_t) > 0
            bkt = (
                signs.reshape(n, _LSH_TABLES, _LSH_PLANES_PER_TABLE)
                * weights
            ).sum(axis=2).astype(np.int32)
            ids = np.repeat(
                np.asarray(batch.column("vec_id"), dtype=np.int64),
                _LSH_TABLES,
            )
            ts = np.tile(np.arange(_LSH_TABLES, dtype=np.int32), n)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.int64()),
                    pa.array(ts, type=pa.int32()),
                    pa.array(bkt.reshape(-1), type=pa.int32()),
                ],
                names=["vec_id", "t", "bkt"],
            )

    return e.select("vec_id", "embedding").mapInArrow(
        buckets, "vec_id bigint, t int, bkt int"
    )


def session_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus' (vec_id, t, bkt) sign-bucket table, built ONCE per
    (session, corpus) — the persisted-index shape of a production
    embedding-dedup pipeline. Before r10 both sides of the candidate
    self-join re-derived the buckets inline (Catalyst does not dedupe
    identical subplans below a join), so every probe paid the bucket
    build twice: 6.3 s of an 8.3 s d_semantic_only_pairs_lsh probe at
    sf0.1 was candidate generation; with the memoized artifact the same
    join runs in ~1 s."""
    from kafka_spark_streaming_spark.tables import session_checkpoint, table

    return session_checkpoint(
        spark,
        f"emb_lsh_buckets:{sf_dir}",
        lambda: lsh_buckets_arrow(table(spark, sf_dir, "embeddings")),
        sf_dir=sf_dir,
    )


def _ann_lsh_oracle() -> str:
    per_table = lsh_bucket_cte()
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    buck AS (
      {per_table}
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM buck q JOIN buck c ON q.t = c.t AND q.bkt = c.bkt
      WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    ),
    scored AS (
      -- same floor-quantize-before-rank as the Spark side (see _q9)
      SELECT cand.query_id, cand.neighbor_id,
             floor(list_cosine_similarity(eq.v, ec.v) * 1e9 + 0.5) / 1e9 AS s
      FROM cand
      JOIN e eq ON eq.vec_id = cand.query_id
      JOIN e ec ON ec.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, round(s, 6) AS score, rn AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """


def _queries_and_candidates(spark: SparkSession, sf_dir: str):
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    return q, c


def _q9(col: F.Column) -> F.Column:
    """floor(s*1e9 + 0.5)/1e9 — 9-digit quantization applied on BOTH
    engines before any rank decision. floor is defined identically
    everywhere, while round() (Spark: BigDecimal HALF_UP; DuckDB:
    binary-double away-from-zero) is not bit-identical; quantizing first
    makes a cross-engine rank flip vanishingly unlikely (only a true
    cosine within 0.5e-9 of a quantization boundary could still differ).
    Same pattern as sim_quantize_int8."""
    return F.floor(col * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def _topk(scored: DataFrame) -> DataFrame:
    scored = scored.withColumn("s", _q9(F.col("s")))
    w = W.partitionBy("query_id").orderBy(
        F.desc("s"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("s", 6).alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


# --- 1: pure-Catalyst brute force ---------------------------------------
@register("sim_topk_bruteforce", _TOPK_ORACLE)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, c = _queries_and_candidates(spark, sf_dir)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("s", cosine_similarity(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "s")
    )
    return _topk(scored)


# --- 2: vectorized numpy GEMM via mapInPandas ----------------------------
@register("sim_topk_blocked", _TOPK_ORACLE)
def sim_topk_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    q, c = _queries_and_candidates(spark, sf_dir)
    qrows = [(r.query_id, list(r.qv)) for r in q.collect()]  # few queries
    qids = [r[0] for r in qrows]
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qnorm))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qn = bc.value
        for pdf in batches:
            cm = np.array(list(pdf["cv"]), dtype=np.float64)
            cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            sims = qn @ cn.T  # (n_queries, batch)
            out = []
            for qi, qid in enumerate(ids):
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": pdf["neighbor_id"].values,
                            "s": sims[qi],
                        }
                    )
                )
            yield pd.concat(out)

    scored = c.mapInPandas(
        score, schema="query_id long, neighbor_id long, s double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    return _topk(scored)


# --- 3: LSH random-hyperplane ANN ----------------------------------------
@register("sim_ann_lsh", _ann_lsh_oracle())
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table random-hyperplane LSH (the standard recall lever:
    L independent tables of k planes each — P(miss) = (1-p^k)^L).
    Buckets are sign patterns against fixed seed-42 hyperplanes, so
    results are deterministic across runs. Candidates = union over
    tables of same-bucket vectors, exact-cosine reranked.

    Buckets come from the memoized session_lsh_buckets artifact — the
    same persisted-index shape d_semantic_only_pairs_lsh uses. Before
    r11 this query re-derived the sign buckets inline with interpreted
    Catalyst HOFs on BOTH sides of the candidate join (the pre-r10
    anti-pattern: Catalyst does not dedupe identical subplans below a
    join), costing 3.2 s warm at sf0.1; the artifact probe runs in
    well under 1 s.

    At 100 TB: per-table bucket sizes stay bounded (add planes as the
    corpus grows), the bucket join is an equi-join Catalyst shuffles on
    (table, bucket), and rerank cost is |candidates| not |corpus|.
    """
    e = table(spark, sf_dir, "embeddings")
    # (vec_id, t, bkt) × embedding: equi-join on vec_id — co-partitioned
    # at scale, broadcast-or-shuffle is AQE's call at fixture size.
    eb = session_lsh_buckets(spark, sf_dir).join(e, "vec_id")

    cand = eb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "t",
        "bkt",
    )
    qb = eb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "t",
        "bkt",
    )
    scored = (
        cand.join(
            F.broadcast(qb),
            ["t", "bkt"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("s", cosine_similarity(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "s")
    )
    return _topk(scored)


# --- 4: IVF-Flat ANN (coarse quantizer + probed cells) -------------------
_IVF_CELLS, _IVF_PROBE, _IVF_DIM = 16, 8, 64


def _ann_ivf_oracle() -> str:
    """Exact SQL replay of the whole IVF construction.  Every step of
    the Spark pipeline is deterministic given the data (strided init,
    one Lloyd step, argmax assignment with highest-cell tie-break,
    top-n_probe cells with lowest-cell tie-break), so DuckDB can
    recompute it independently: the centroids come out ulp-identical
    and every downstream decision (cell argmax, probe ranking, final
    top-k) has decision margins ~1e-2 vs cross-engine float noise
    ~1e-13.  This removes the registry's last no-oracle query."""
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (SELECT GREATEST(COUNT(*) // {_IVF_CELLS}, 1) AS stride FROM e),
    init AS (
      SELECT CAST(e.vec_id // p.stride AS INT) AS cell,
             list_transform(e.v,
               x -> x / sqrt(list_dot_product(e.v, e.v))) AS c
      FROM e, p
      WHERE e.vec_id % p.stride = 0 AND e.vec_id < p.stride * {_IVF_CELLS}
    ),
    assign1 AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, i.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, i.c)
                          / sqrt(list_dot_product(e.v, e.v)) DESC,
                          i.cell DESC) AS rn
        FROM e CROSS JOIN init i)
      WHERE rn = 1
    ),
    dims AS (
      SELECT a.cell, gs.d AS pos, AVG(a.v[gs.d]) AS m
      FROM assign1 a CROSS JOIN generate_series(1, {_IVF_DIM}) AS gs(d)
      GROUP BY a.cell, gs.d
    ),
    newc AS (
      SELECT cell, LIST(m ORDER BY pos) AS raw FROM dims GROUP BY cell
    ),
    cent2 AS (
      SELECT i.cell,
             CASE WHEN n.raw IS NOT NULL
                       AND sqrt(list_dot_product(n.raw, n.raw)) > 0
                  THEN list_transform(n.raw,
                         x -> x / sqrt(list_dot_product(n.raw, n.raw)))
                  ELSE i.c END AS c
      FROM init i LEFT JOIN newc n USING (cell)
    ),
    corpus AS (
      SELECT vec_id AS neighbor_id, v AS cv, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, c.c)
                          / sqrt(list_dot_product(e.v, e.v)) DESC,
                          c.cell DESC) AS rn
        FROM e CROSS JOIN cent2 c)
      WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.v, c.c) DESC,
                          c.cell ASC) AS rn
        FROM e q CROSS JOIN cent2 c WHERE q.vec_id < {N_QUERIES})
      WHERE rn <= {_IVF_PROBE}
    ),
    scored AS (
      -- floor-quantize to 9 digits BEFORE ranking so cross-engine
      -- float-sum noise (~1e-13) makes rank flips vanishingly unlikely
      -- (a true cosine within 0.5e-9 of a boundary could still land
      -- either side); floor, not round: round() tie-breaking and its
      -- decimal/binary path are engine-specific
      SELECT p.query_id, co.neighbor_id,
             floor(list_cosine_similarity(p.qv, co.cv) * 1e9 + 0.5) / 1e9 AS s
      FROM corpus co JOIN probes p USING (cell)
      WHERE p.query_id <> co.neighbor_id
    )
    SELECT query_id, neighbor_id, round(s, 6) AS score, rn AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """


def ivf_assign_catalyst(centroids) -> F.Column:
    """argmax-cosine cell id, pure Catalyst: greatest() over per-centroid
    dot products of the normalized vector. The HOF dots are interpreted
    (not codegen'd) and the when-chain re-evaluates them, so this costs
    ~3.5 s per pass over 2000×16 at sf0.1 — kept ONLY as the exactness
    twin for ivf_assign_arrow (same role as lsh_buckets vs
    lsh_buckets_arrow); no registered query executes it."""
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    dots = [
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(float(v)) for v in c]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / norm
        for c in centroids
    ]
    best = F.greatest(*dots)
    cell = F.lit(0)
    for i, d in enumerate(dots):
        cell = F.when(d == best, F.lit(i)).otherwise(cell)
    return cell


def ivf_assign_arrow(e: DataFrame, cmat) -> DataFrame:
    """(vec_id, embedding, cell): argmax-cosine assignment via one
    (batch × dim) @ (dim × n_cells) matmul per Arrow batch — the Arrow
    twin of ivf_assign_catalyst (exact frame equality pinned by test).

    Correctness: the /‖v‖ normalization is a positive per-row scalar,
    so argmax(dot/‖v‖) == argmax(dot) and the kernel skips the divide.
    numpy's blocked summation rounds differently from the sequential
    fold / DuckDB's list_dot_product, but cell-decision margins are
    ~1e-2 on every fixture vs reorder noise ~1e-13 — the same
    sign/argmax-robustness premise the cross-engine oracle rests on.
    Ties break to the HIGHEST cell (oracle: ORDER BY dot DESC, cell
    DESC), implemented as reversed argmax.

    100 TB posture: mapInArrow streams batches, the centroid matrix is
    a ~8 KB task constant, output adds one int column — the assignment
    scans the corpus once and becomes a partition column."""
    import numpy as np
    import pyarrow as pa

    cm = np.ascontiguousarray(np.asarray(cmat, dtype=np.float64).T)
    n_cells = cm.shape[1]

    def assign(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            emb = batch.column("embedding")
            vals = np.asarray(emb.flatten(), dtype=np.float64)
            if vals.size != n * _IVF_DIM:  # ragged input: contract is
                raise ValueError(f"embedding dim != {_IVF_DIM}")  # fixed-dim
            dots = vals.reshape(n, _IVF_DIM) @ cm
            cell = (n_cells - 1) - np.argmax(dots[:, ::-1], axis=1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("vec_id"),
                    emb,
                    pa.array(cell.astype(np.int32), type=pa.int32()),
                ],
                names=["vec_id", "embedding", "cell"],
            )

    return e.select("vec_id", "embedding").mapInArrow(
        assign, "vec_id bigint, embedding array<float>, cell int"
    )


def ivf_init_centroids(rows, n_cells: int = _IVF_CELLS):
    """Normalized strided-init centroid matrix from the collected
    (vec_id-ordered) init rows — shared by the session index build and
    the streaming index's batch-0 training (r18), so the deterministic
    construction recipe cannot drift between the two.  n_cells is a
    contract check, not a selector (ADVICE r18: it used to be silently
    ignored): callers pre-filter rows to the cell count themselves,
    and a mismatch means the strided-init sample was built for a
    different index size."""
    import numpy as np

    if len(rows) > n_cells:
        raise ValueError(
            f"{len(rows)} init rows for a {n_cells}-cell index"
        )
    cmat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    cmat /= np.linalg.norm(cmat, axis=1, keepdims=True)
    return cmat


def lloyd_refine(assigned: DataFrame, cmat):
    """One Lloyd step: re-center each cell over its assigned vectors
    (posexplode → per-(cell, dim) avg, ONE shuffle), keep the init
    centroid for empty cells, re-normalize.  Bounded collect:
    n_cells rows.  Factored out of session_ivf_index (r18) so the
    streaming IVF index trains its frozen quantizer with bit-identical
    code."""
    import numpy as np

    centers = (
        assigned.select("cell", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s.m).alias("centroid"))
        .collect()
    )
    cmat2 = cmat.copy()
    for r in centers:
        v = np.array(r.centroid, dtype=np.float64)
        n = np.linalg.norm(v)
        if n > 0:
            cmat2[r.cell] = v / n
    return cmat2


def ivf_probe_cells(q_rows, cmat2, n_probe: int = _IVF_PROBE):
    """Per-query probed-cell lists: stable argsort of -(Q @ C.T) so an
    exact dot-product tie ranks 'dot DESC, cell ASC' like the oracle
    (default quicksort breaks ties arbitrarily and could probe
    different cells).  Shared by sim_ann_ivf and the streaming index's
    read path (r18)."""
    import numpy as np

    qmat = np.array([list(r.embedding) for r in q_rows], dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    return np.argsort(-(qmat @ cmat2.T), axis=1, kind="stable")[:, :n_probe]


def session_ivf_index(spark: SparkSession, sf_dir: str,
                      n_cells: int = _IVF_CELLS):
    """The corpus' IVF index — (vec_id, embedding, cell) rows plus the
    refined centroid matrix — built ONCE per (session, corpus) via
    session_checkpoint (fixture-fingerprint-keyed, so regeneration
    can't serve stale cells). The centroid matrix rides the SAME cache
    entry as a sidecar (one key, one eviction path — VERDICT r11 #4 /
    ADVICE r11 replaced the per-module side-channel dict that leaked
    and could KeyError on a hit without a matching centroid entry).
    Construction is deterministic given the data: strided init, one
    Lloyd step (re-center = posexplode → per-(cell,dim) avg, ONE
    shuffle), Arrow-matmul assignment.

    Before r11 sim_ann_ivf rebuilt all of this inline per call with
    the interpreted Catalyst when-chain on both Lloyd and final
    assignment — 8.3 s warm at sf0.1, the slowest batch query in the
    registry (SWEEP_r11); the memoized artifact probe is ~0.3 s and the
    one-time build ~1.5 s, reported in derived_build_sec."""
    from kafka_spark_streaming_spark.tables import session_checkpoint

    def build():
        e = table(spark, sf_dir, "embeddings")
        # deterministic init: evenly-strided vec_ids (seedless,
        # reproducible); n_total is a bounded scalar (init stride)
        n_total = e.count()
        stride = max(n_total // n_cells, 1)
        init = (
            e.filter(
                (F.col("vec_id") % stride == 0)
                & (F.col("vec_id") < stride * n_cells)
            )
            .orderBy("vec_id")
            .collect()
        )
        cmat = ivf_init_centroids(init, n_cells)
        # one Lloyd step: re-center each cell (posexplode → per-dim avg)
        cmat2 = lloyd_refine(ivf_assign_arrow(e, cmat), cmat)
        return ivf_assign_arrow(e, cmat2), cmat2

    return session_checkpoint(
        spark,
        f"ivf_index{n_cells}:{sf_dir}",
        build,
        sf_dir=sf_dir,
        with_sidecar=True,
    )


@register("sim_ann_ivf", _ann_ivf_oracle())
def sim_ann_ivf(spark: SparkSession, sf_dir: str,
                n_cells: int = _IVF_CELLS,
                n_probe: int = _IVF_PROBE) -> DataFrame:
    """IVF-Flat: k-means coarse quantizer partitions the corpus into
    cells; queries probe only their n_probe nearest cells, so search
    cost is ~(n_probe/n_cells) of a full scan + a tiny rerank.

    Construction lives in session_ivf_index (memoized per corpus, the
    persisted-index production shape); this probe ranks cells for each
    query against the refined centroids, joins the probed cells, and
    exact-cosine reranks. At 100 TB the inverted lists are just a
    `cell` partition column on the embedding table — partition pruning
    IS the index probe.

    Note the fixture's vectors are near-uniform on the sphere (no
    cluster structure), so recall ≈ scanned fraction; tests assert
    exactly that relationship rather than a vanity recall number.
    """
    index, cmat2 = session_ivf_index(spark, sf_dir, n_cells)
    corpus = index.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "cell",
    )
    # queries probe their n_probe nearest cells (stable tie-break —
    # see ivf_probe_cells)
    q = index.filter(F.col("vec_id") < N_QUERIES).collect()
    probes = ivf_probe_cells(q, cmat2, n_probe)
    probe_rows = [
        (int(r.vec_id), list(r.embedding), [int(c) for c in probes[i]])
        for i, r in enumerate(q)
    ]
    qdf = spark.createDataFrame(
        probe_rows, "query_id long, qv array<float>, cells array<int>"
    ).select("query_id", "qv", F.explode("cells").alias("cell"))

    scored = (
        corpus.join(F.broadcast(qdf), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # raw cosine here; _topk applies the _q9 floor-quantization that
        # matches the oracle's floor(s*1e9+0.5)/1e9 for every caller
        .withColumn("s", cosine_similarity(F.col("qv"), F.col("cv")))
        .select("query_id", "neighbor_id", "s")
    )
    return _topk(scored)


# --- 5: Product Quantization ANN (PQ codes + ADC scan) -------------------
# The memory-compressed ANN tier (Jégou et al., "Product Quantization
# for Nearest Neighbor Search", TPAMI'11): split the 64-dim space into
# M=8 subspaces of 8 dims, learn K=8 codewords per subspace (strided
# init + one Lloyd step — same deterministic construction recipe as
# sim_ann_ivf), encode every vector as 8 small codes, and answer
# queries by Asymmetric Distance Computation: the query precomputes a
# (M×K) lookup table of exact subspace distances, and each candidate's
# approximate distance is just the sum of M table entries for its
# codes.
#
# 100 TB posture: the codes table IS the index — M bytes per vector
# (~500 GB for 64-byte codes over a trillion vectors vs 256 TB of raw
# floats), scanned with a broadcast LUT join + sum; raw vectors are
# never touched at query time. Training runs on a sample at scale
# (here: the whole fixture). Unlike sim_ann_ivf, even the codebook
# refinement stays distributed — cb0/cb1 are DataFrames end to end,
# the only driver scalar is the init stride (count(), k-means-standard).
#
# Determinism contract (what makes it exactly oracle-able): strided
# init, ties broken k ASC, every distance floor-quantized to 9 digits
# (_q9) BEFORE any argmin/rank decision on BOTH engines, recentered
# codewords derived relationally in both engines (cross-engine avg
# noise ~1e-15 vs 0.5e-9 quantization cells).
_PQ_M, _PQ_DSUB, _PQ_K = 8, 8, 8


def _pq_oracle() -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (SELECT GREATEST(COUNT(*) // {_PQ_K}, 1) AS stride FROM e),
    sub AS (
      SELECT vec_id, CAST((gs.i - 1) // {_PQ_DSUB} AS INT) AS m,
             CAST((gs.i - 1) % {_PQ_DSUB} AS INT) AS pos, v[gs.i] AS x
      FROM e CROSS JOIN generate_series(1, {_PQ_M * _PQ_DSUB}) AS gs(i)),
    cb0 AS (
      SELECT s.m, CAST(s.vec_id // p.stride AS INT) AS k, s.pos, s.x AS c
      FROM sub s, p
      WHERE s.vec_id % p.stride = 0 AND s.vec_id < p.stride * {_PQ_K}),
    d0 AS (
      SELECT s.vec_id, s.m, c.k,
             floor(SUM((s.x - c.c) * (s.x - c.c)) * 1e9 + 0.5) / 1e9 AS d2
      FROM sub s JOIN cb0 c ON c.m = s.m AND c.pos = s.pos
      GROUP BY s.vec_id, s.m, c.k),
    a0 AS (
      SELECT vec_id, m, k FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                   ORDER BY d2 ASC, k ASC) AS rn FROM d0) WHERE rn = 1),
    cb1 AS (
      SELECT c0.m, c0.k, c0.pos, COALESCE(r.c, c0.c) AS c
      FROM cb0 c0 LEFT JOIN (
        -- r8: floor-quantize the recentered codeword itself (the
        -- sim_lang_centroid_dims pattern) so d1 is computed from
        -- bit-identical codebooks in both engines
        SELECT s.m, a.k, s.pos,
               floor(AVG(s.x) * 1e9 + 0.5) / 1e9 AS c
        FROM sub s JOIN a0 a ON a.vec_id = s.vec_id AND a.m = s.m
        GROUP BY s.m, a.k, s.pos) r
        ON r.m = c0.m AND r.k = c0.k AND r.pos = c0.pos),
    d1 AS (
      SELECT s.vec_id, s.m, c.k,
             floor(SUM((s.x - c.c) * (s.x - c.c)) * 1e9 + 0.5) / 1e9 AS d2
      FROM sub s JOIN cb1 c ON c.m = s.m AND c.pos = s.pos
      GROUP BY s.vec_id, s.m, c.k),
    codes AS (
      SELECT vec_id, m, k FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                   ORDER BY d2 ASC, k ASC) AS rn FROM d1) WHERE rn = 1),
    qtab AS (
      SELECT vec_id AS query_id, m, k, d2
      FROM d1 WHERE vec_id < {N_QUERIES}),
    adc AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             floor(SUM(q.d2) * 1e9 + 0.5) / 1e9 AS d
      FROM codes c JOIN qtab q ON q.m = c.m AND q.k = c.k
      WHERE q.query_id <> c.vec_id
      GROUP BY q.query_id, c.vec_id)
    SELECT query_id, neighbor_id, round(d, 6) AS adc_dist, rn AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY d ASC, neighbor_id ASC) AS rn
          FROM adc)
    WHERE rn <= {TOP_K}
    """


def _pq_subvectors(e: DataFrame) -> DataFrame:
    """(vec_id, m, pos, x): every vector exploded into its M subspace
    coordinates."""
    return e.select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda v: v.cast("double"))).alias(
            "i", "x"
        ),
    ).select(
        "vec_id",
        F.floor(F.col("i") / _PQ_DSUB).cast("int").alias("m"),
        F.pmod("i", F.lit(_PQ_DSUB)).cast("int").alias("pos"),
        "x",
    )


def _pq_subspace_dists(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """Quantized squared L2 of every (vector, subspace, codeword)."""
    return (
        sub.join(F.broadcast(cb), ["m", "pos"])
        .groupBy("vec_id", "m", "k")
        .agg(
            _q9(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
            ).alias("d2")
        )
    )


def _pq_argmin_codes(dists: DataFrame) -> DataFrame:
    w = W.partitionBy("vec_id", "m").orderBy(F.asc("d2"), F.asc("k"))
    return (
        dists.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "k", "d2")
    )


def pq_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(cb1, d1): the trained codebook and the per-(vector, subspace,
    codeword) distance table the query path derives codes/LUTs from —
    exposed for tests (the ADC triangle-inequality invariant needs the
    index internals).

    Both halves are memoized per (session, corpus) via
    session_checkpoint (fixture-fingerprint-keyed) — a trained PQ index
    is a persisted artifact of the corpus, not per-query work. Before
    r11 every sim_pq_adc_topk call retrained codebook + distances
    inline (1.8 s warm at sf0.1, SWEEP_r11); the memoized probe is the
    ADC join only."""
    from kafka_spark_streaming_spark.tables import session_checkpoint

    def build_cb1() -> DataFrame:
        e = table(spark, sf_dir, "embeddings")
        n_total = e.count()  # bounded scalar: init stride, as sim_ann_ivf
        stride = max(n_total // _PQ_K, 1)
        sub = _pq_subvectors(e)
        cb0 = sub.filter(
            (F.col("vec_id") % stride == 0)
            & (F.col("vec_id") < stride * _PQ_K)
        ).select(
            "m",
            F.floor(F.col("vec_id") / stride).cast("int").alias("k"),
            "pos",
            F.col("x").alias("c"),
        )
        a0 = _pq_argmin_codes(_pq_subspace_dists(sub, cb0)).select(
            "vec_id", "m", "k"
        )
        recentered = (
            sub.join(a0, ["vec_id", "m"])
            .groupBy("m", "k", "pos")
            .agg(_q9(F.avg("x")).alias("rc"))  # quantized at the source —
            # see the oracle's cb1 comment
        )
        return cb0.join(recentered, ["m", "k", "pos"], "left").select(
            "m", "k", "pos", F.coalesce("rc", "c").alias("c")
        )  # 512 rows; the checkpoint pins the trained codebook

    # both builds contain joins: parquet storage grounds the stats
    # (the r14 broadcast-poisoning class, see session_checkpoint) —
    # the 512-row codebook was estimated at 6e16 bytes, which blocked
    # the broadcast the sim_pq_adc_topk docstring promises
    cb1 = session_checkpoint(
        spark,
        f"pq_codebook:{sf_dir}",
        build_cb1,
        sf_dir=sf_dir,
        storage="parquet",
    )
    d1 = session_checkpoint(
        spark,
        f"pq_dists:{sf_dir}",
        lambda: _pq_subspace_dists(
            _pq_subvectors(table(spark, sf_dir, "embeddings")), cb1
        ),
        sf_dir=sf_dir,
        storage="parquet",
    )
    return cb1, d1


@register("sim_pq_adc_topk", _pq_oracle())
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encode + ADC top-k — see the block comment above. Every stage
    is a plain relational plan: explode to (vec_id, m, pos, x), equi-
    join the (broadcast, M·K·DSUB = 512-row) codebook, hash-aggregate
    subspace distances, window-argmin the codes."""
    _cb1, d1 = pq_index(spark, sf_dir)
    codes = _pq_argmin_codes(d1).select("vec_id", "m", "k")
    qtab = d1.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "m", "k", F.col("d2").alias("qd")
    )
    adc = (
        codes.join(F.broadcast(qtab), ["m", "k"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(_q9(F.sum("qd")).alias("d"))
    )
    w = W.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.round("d", 6).alias("adc_dist"),
            "rank",
        )
    )


# --- per-language embedding centroids (elementwise array aggregate) ------
# The "average the vectors per group" primitive every embedding
# pipeline needs (cluster centroids, class prototypes). Expressed as
# posexplode → groupBy(lang, pos) → avg: the explode turns elementwise
# array math into plain columnar aggregation that partial-aggregates
# map-side and scales with executors — no UDF, no collect. Output is
# limited to the first 8 dimensions to keep the oracle readable; the
# plan shape is dimension-count-independent.
@register(
    "sim_lang_centroid_dims",
    """
    WITH ed AS (
      SELECT d.lang, CAST(e.embedding AS DOUBLE[]) AS v
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
    ex AS (
      SELECT lang, i.i - 1 AS pos, v[i.i] AS x
      FROM ed, (SELECT unnest(range(1, 9)) AS i) i)
    -- floor-quantize the mean before the 6-digit round (same _q9
    -- pattern as the ranking paths): partial-aggregation order differs
    -- between engines by ~1e-13
    SELECT lang, pos,
           round(floor(AVG(x) * 1e9 + 0.5) / 1e9, 6) AS centroid_x,
           COUNT(*) AS n_vecs
    FROM ex GROUP BY lang, pos
    """,
)
def sim_lang_centroid_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    ed = e.join(F.broadcast(d), e.vec_id == d.doc_id).select(
        "lang", F.slice("embedding", 1, 8).alias("v")
    )
    ex = ed.select(
        "lang", F.posexplode("v").alias("pos", "x")
    ).select("lang", "pos", F.col("x").cast("double").alias("x"))
    return ex.groupBy("lang", "pos").agg(
        F.round(_q9(F.avg("x")), 6).alias("centroid_x"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


# --- embedding int8 quantization -----------------------------------------
# The compression pass before serving/shipping an ANN index: per-vector
# absmax scaling to int8 (q = floor(x·127/absmax + 0.5), symmetric).
# floor(x + 0.5) instead of round() on purpose: both engines define
# floor identically, while round() tie-breaking (half-up vs half-even)
# is engine-specific — the determinism trap of quantization pipelines.
# A pure per-row map over the vector column; emits the scale factor and
# two integer checksums of the quantized vector rather than 64 int8
# columns (exact, order-independent evidence the bytes match).
@register(
    "sim_quantize_int8",
    """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
    s AS (
      SELECT vec_id, x,
             list_max(list_transform(x, e -> abs(e))) AS amax
      FROM v),
    q AS (
      SELECT vec_id, amax,
             list_transform(x, e -> CAST(floor(e * 127.0 / amax + 0.5)
                                         AS BIGINT)) AS qv
      FROM s WHERE amax > 0)
    SELECT vec_id, round(amax, 6) AS amax_6,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, e -> abs(e))) AS BIGINT)
             AS q_l1
    FROM q
    """,
)
def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda v: v.cast("double"))
    s = e.select(
        "vec_id",
        xd.alias("x"),
        F.array_max(F.transform(xd, lambda v: F.abs(v))).alias("amax"),
    ).filter(F.col("amax") > 0)
    qv = F.transform(
        "x",
        lambda v: F.floor(v * 127.0 / F.col("amax") + 0.5).cast("bigint"),
    )
    q = s.select("vec_id", "amax", qv.alias("qv"))
    zero = F.lit(0).cast("bigint")
    return q.select(
        "vec_id",
        F.round("amax", 6).alias("amax_6"),
        F.aggregate("qv", zero, lambda a, v: a + v).alias("q_sum"),
        F.aggregate("qv", zero, lambda a, v: a + F.abs(v)).alias("q_l1"),
    )


# --- k-means corpus clustering (full-vector Lloyd, fully relational) -----
# The corpus-partitioning primitive (semantic sharding, curriculum
# binning, cluster-balanced sampling): k=8 centroids, deterministic
# stride init (the same seeding sim_ann_ivf and the PQ codebook use),
# ONE Lloyd update, final assignment → per-cluster sizes + inertia.
# Identical relational machinery to the PQ codebook but over the FULL
# vector (PQ's m-subspace Lloyd with M=1): posexplode to (vec_id, pos,
# x), equi-join the broadcast (k·D = 512-row) centroid table, hash-agg
# the squared distances (_q9-quantized so both engines rank
# identically), window-argmin per vector, recenter by plain AVG.
# Inertia is summed in exact integer micro-units (floor(d2·1e6+0.5) as
# BIGINT) — integer addition is order-independent, so the cross-engine
# sum is bit-identical regardless of partial-aggregation order.
# At 100 TB: centroids are always k·D rows (broadcast), every pass is
# one scan + one groupBy, the argmin window partitions by vec_id (never
# global), and more Lloyd rounds = more unrolled stages, not a driver
# loop.
_KM_K = 8


def _kmeans_oracle() -> str:
    def dist_cte(name: str, cb: str) -> str:
        return f"""
    {name} AS (
      SELECT pts.vec_id, c.k,
             floor(SUM((pts.x - c.c) * (pts.x - c.c)) * 1e9 + 0.5) / 1e9
               AS d2
      FROM pts JOIN {cb} c ON c.pos = pts.pos
      GROUP BY pts.vec_id, c.k)"""

    def argmin_cte(name: str, d: str) -> str:
        return f"""
    {name} AS (
      SELECT vec_id, k, d2 FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY d2 ASC, k ASC) AS rn FROM {d}) WHERE rn = 1)"""

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    p AS (SELECT GREATEST(COUNT(*) // {_KM_K}, 1) AS stride FROM e),
    pts AS (
      SELECT vec_id, CAST(gs.i - 1 AS INT) AS pos, v[gs.i] AS x
      FROM e, unnest(generate_series(1, len(e.v))) AS gs(i)),
    c0 AS (
      SELECT CAST(pts.vec_id // p.stride AS INT) AS k, pos, x AS c
      FROM pts, p
      WHERE pts.vec_id % p.stride = 0 AND pts.vec_id < p.stride * {_KM_K}),
    {dist_cte('d0', 'c0')},
    {argmin_cte('a0', 'd0')},
    rec AS (
      -- floor-quantize the recentered coordinate itself (same pattern
      -- as sim_lang_centroid_dims): partial-aggregation order noise is
      -- absorbed at the CENTROID, so every downstream distance is
      -- computed from bit-identical inputs in both engines
      SELECT a.k, pts.pos,
             floor(AVG(pts.x) * 1e9 + 0.5) / 1e9 AS rc
      FROM pts JOIN a0 a ON a.vec_id = pts.vec_id
      GROUP BY a.k, pts.pos),
    c1 AS (
      SELECT c0.k, c0.pos, COALESCE(r.rc, c0.c) AS c
      FROM c0 LEFT JOIN rec r ON r.k = c0.k AND r.pos = c0.pos),
    {dist_cte('d1', 'c1')},
    {argmin_cte('a1', 'd1')}
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           round(SUM(CAST(floor(d2 * 1e6 + 0.5) AS BIGINT)) / 1000000.0, 6)
             AS inertia
    FROM a1 GROUP BY k ORDER BY k
    """


def _km_dists(pts: DataFrame, cb: DataFrame) -> DataFrame:
    return (
        pts.join(F.broadcast(cb), "pos")
        .groupBy("vec_id", "k")
        .agg(
            _q9(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
            ).alias("d2")
        )
    )


def _km_argmin(dists: DataFrame) -> DataFrame:
    # argmin as MIN(struct(d2, k)) — lexicographic struct comparison is
    # exactly the window's (d2 ASC, k ASC) first-row semantics (d2 is
    # _q9-quantized, never NaN), verified row-identical at sf0.1.  The
    # aggregate replaces the r20 sort+row_number window per Lloyd pass:
    # partial aggregation runs map-side on the (vec_id, k)-partitioned
    # dist rows, so the argmin exchange carries ONE row per vector
    # instead of k, and both per-pass sorts disappear (guide §2.3 —
    # aggregate before you shuffle; at scale the argmin shuffle shrinks
    # k-fold).
    return (
        dists.groupBy("vec_id")
        .agg(F.min(F.struct("d2", "k")).alias("m"))
        .select("vec_id", F.col("m.k").alias("k"), F.col("m.d2").alias("d2"))
    )


@register("sim_kmeans_clusters", _kmeans_oracle())
def sim_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    n_total = e.count()  # bounded scalar: stride init, as in pq_index
    stride = max(n_total // _KM_K, 1)
    pts = e.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda v: v.cast("double"))
        ).alias("pos", "x"),
    )
    c0 = pts.filter(
        (F.col("vec_id") % stride == 0) & (F.col("vec_id") < stride * _KM_K)
    ).select(
        F.floor(F.col("vec_id") / stride).cast("int").alias("k"),
        "pos",
        F.col("x").alias("c"),
    )
    a0 = _km_argmin(_km_dists(pts, c0)).select("vec_id", "k")
    rec = (
        pts.join(a0, "vec_id")
        .groupBy("k", "pos")
        .agg(_q9(F.avg("x")).alias("rc"))  # quantized at the source —
        # see the oracle's rec CTE comment
    )
    c1 = (
        c0.join(rec, ["k", "pos"], "left")
        .select("k", "pos", F.coalesce("rc", "c").alias("c"))
        # k·D rows; pins the trained centroids and keeps the first
        # Lloyd pass out of the broadcast-build path.  EAGER again
        # since r22 (ADVICE r21 #1): the r21 lazy flip moved the whole
        # first Lloyd pass (scan + shuffle + argmin + recenter) INSIDE
        # the BroadcastExchange build of _km_dists(pts, c1), which runs
        # under spark.sql.broadcastTimeout — at the 100 TB posture the
        # first pass can exceed the 300 s window and hard-fail.  The
        # quiet-window interleaved A/B VERDICT r21 #2 asked for
        # (7 rounds, q1 canary 1.06-1.15x) measured the three arms
        # indistinguishable — eager+aggregate 1.345 s min / lazy+
        # aggregate 1.365 / eager+window(r20) 1.346 — so the r21
        # "regression" was window noise, the 0.24 s lazy win was too,
        # and eager is free at fixture scale while being the only
        # scale-safe choice.
        .localCheckpoint(eager=True)
    )
    a1 = _km_argmin(_km_dists(pts, c1))
    return (
        a1.select(
            "k",
            F.floor(F.col("d2") * 1e6 + F.lit(0.5))
            .cast("bigint")
            .alias("d2q"),
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.sum("d2q") / 1000000.0, 6).alias("inertia"),
        )
        .orderBy("k")
    )
