"""kNN tile retrieval per query point: ring expansion over quadtree
cell disks with a secondary sort on haversine distance (SURVEY.md
§2.3 J5 / §2.5 W5; north rule: "kNN tile retrieval per query point
using ring-expansion over H3 disks with a secondary sort on
haversine distance").

Algorithm (driver-side iterative DataFrame loop — SURVEY.md §4 item 2):

  The TILE side is the big side (10^12 rows at target scale): it is
  cell-indexed by a pure JVM column expression, persisted, and NEVER
  shuffled — each round equi-joins a broadcast shell-cell table
  against it and only the matched candidates shuffle (keyed by
  query_id) into the per-query top-k window.

  The QUERY side is the small side (a retrieval request set). It is
  pulled to the driver once; ring shells are computed in driver NumPy
  (functions/cells.cell_shell_batch) and shipped per round as a
  broadcast DataFrame. This keeps the whole loop at ONE distributed
  action per round (the per-query aggregate that decides who is
  finished) with zero Python stages in the executor plan — at local
  benchmark scale the win is plan-compile/worker-startup latency; on
  a cluster it means the only Python in the job is the driver loop.
  Query sets beyond ~10^6 rows would need the (slower) distributed
  shell variant — out of scope for a retrieval API.

  Round i explores the shell of cells with grid Chebyshev distance in
  (r_{i-1}, r_i] of each ACTIVE query's cell. The initial radius r_0
  is chosen from measured tile density (one aggregate over the
  indexed tile table) so the first disk is expected to hold ~3k
  candidates — the common case finishes in ONE round. A query
  finalizes when it holds >= k candidates whose k-th distance is <=
  the conservative lower bound on anything outside the explored disk
  (functions/cells.knn_bound_km). Queries still unresolved after
  max_rounds (points in empty deserts) are finalized by ONE exact
  brute-force pass shared by all stragglers.

Determinism: ranking orders by (dist, image_id) — the id tie-break
makes the output exact-match reproducible at any parallelism
(SURVEY.md §7.3); distances are float64 column expressions (JVM,
whole-stage codegen), identical order of operations everywhere. The
driver-side bound check only decides WHEN a query stops expanding,
never which rows rank — results are bound-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gelos_spark.functions import cells
from gelos_spark.functions.cell_udfs import cell_encode_col
from gelos_spark.functions.geometry import haversine_col

def _schemas(qid_type: str) -> tuple[str, str, str]:
    """(shell, straggler, out) schemas with the caller's query-id type
    carried through — string ids work the same as the default long."""
    return (
        f"query_id {qid_type}, qlon double, qlat double, k int, cell long",
        f"query_id {qid_type}, qlon double, qlat double, k int",
        f"query_id {qid_type}, rank int, image_id string, dist_km double",
    )


def _qid_type(queries, q: pd.DataFrame) -> str:
    """Spark type for query_id carried through shells/stragglers/output.
    For a pandas query frame the dtype maps faithfully (float ids were
    previously declared bigint — silent truncation); unsupported id
    dtypes raise instead of guessing."""
    if not isinstance(queries, pd.DataFrame):
        return queries.schema["query_id"].dataType.simpleString()
    dt = q["query_id"].dtype
    if dt == object:
        return "string"
    if np.issubdtype(dt, np.floating):
        return "double"
    if np.issubdtype(dt, np.integer):
        return "bigint"
    raise ValueError(f"unsupported query_id dtype {dt!r}: use int, float, or str ids")


def default_res(n_tiles: int) -> int:
    """Pick the search resolution so a handful of cells holds ~k
    tiles at average density (tiles span ~1/9 of the globe in the
    fixtures; the loop self-corrects either way)."""
    return int(np.clip(int(np.log2(max(n_tiles, 2)) / 2) + 1, 3, 14))


def _initial_radius(stats: dict, res: int, k_max: int, target_mult: float = 3.0) -> int:
    """Smallest disk radius whose expected candidate count is
    >= target_mult * k, from the measured tile density: occupancy over
    the data bbox x tiles-per-occupied-cell."""
    n = 1 << res
    n_tiles, occ = max(stats["n"], 1), max(stats["occ"], 1)
    bx = max((stats["lon1"] - stats["lon0"]) / 360.0 * n, 0.0) + 1.0
    by = max((stats["lat1"] - stats["lat0"]) / 180.0 * n, 0.0) + 1.0
    occupancy = min(occ / (bx * by), 1.0)
    per_cell = n_tiles / occ
    density = occupancy * per_cell  # expected tiles per grid cell
    if density <= 0:
        return 1
    need = target_mult * k_max / density
    r = int(np.ceil((np.sqrt(need) - 1.0) / 2.0))
    return int(np.clip(r, 1, max(n // 2, 1)))


def _shell_pdf(q: pd.DataFrame, res: int, r0: int, r1: int) -> pd.DataFrame:
    """Exploded (query_id, qlon, qlat, k, cell) shell pairs for all
    rows of the active query frame — driver NumPy, fully vectorized."""
    idx, shell = cells.cell_shell_batch(q["qcell"].to_numpy(), res, r0, r1)
    return pd.DataFrame(
        {
            "query_id": q["query_id"].to_numpy()[idx],
            "qlon": q["lon"].to_numpy()[idx],
            "qlat": q["lat"].to_numpy()[idx],
            "k": q["k"].to_numpy()[idx].astype(np.int32),
            "cell": shell,
        }
    ).drop_duplicates(["query_id", "cell"])


def knn_join(
    spark: SparkSession,
    tiles: DataFrame,
    queries: DataFrame | pd.DataFrame,
    res: int | None = None,
    n_tiles_hint: int | None = None,
    max_rounds: int = 3,
    brute_force_pairs: int = 2_000_000,
    checkpoint: bool | str = True,
    max_queries: int | None = 100_000,
) -> DataFrame:
    """k nearest tiles per query point.

    tiles: (image_id, lon, lat); queries: (query_id, lon, lat, k) —
    a Spark or pandas DataFrame (the query side is driver-resident).
    Returns (query_id, rank, image_id, dist_km), ordered by
    (query_id, rank).

    A Spark ``queries`` frame with more than ``max_queries`` rows is
    NOT collected: the call auto-dispatches to
    :func:`knn_join_distributed` (bit-identical results; the query
    side then stays distributed end-to-end), so a corpus-sized query
    table can never silently OOM the driver here — the same guard
    contract as ``brute_force_topk(max_queries=)``
    (operators/similarity.py). The guard is folded into the one
    collect this path needs anyway (``limit(n+1).toPandas()``), so it
    costs ZERO extra Spark actions. ``max_queries=None`` skips the
    guard (caller asserts the frame is request-sized);
    ``brute_force_pairs``/``max_rounds`` apply only to the
    driver-resident path.

    ``checkpoint``: materialization policy for the returned frame
    (plans/materialize.finalize) — True = eager localCheckpoint
    (default; round caches released now), "reliable" = durable
    ``DataFrame.checkpoint()`` for cluster executor-loss survival,
    False = the composable lazy plan (caches stay persisted; the
    caller owns their lifetime).

    Cost-based path selection: when tiles x queries <=
    ``brute_force_pairs`` one exact brute-force pass is cheaper than
    ring expansion (each ring round costs a full distributed action;
    measured crossover on local[32] is ~2-10M pairs — above it the
    brute pass's per-query window shuffle dominates and ring pruning
    wins), so the rounds are skipped and every query takes the brute
    pass. Ring expansion is the 10^12-tile design; results are
    identical either way (both exact, ties broken by id). Set
    ``brute_force_pairs=0`` to force the ring path.
    """
    n_hint = n_tiles_hint if n_tiles_hint is not None else tiles.count()
    if res is None:
        res = default_res(n_hint)
    n_grid = 1 << res

    if isinstance(queries, pd.DataFrame):
        q = queries
    elif max_queries is not None:
        # guard folded into the one collect the path needs anyway: pull
        # AT MOST max_queries+1 rows (zero extra Spark actions — a
        # separate count() probe costs ~0.6s/call on this VM's
        # per-action overhead) and dispatch on overflow
        q = queries.limit(max_queries + 1).toPandas()
        if len(q) > max_queries:
            # corpus-sized query table: never collect it fully — route
            # to the fully-distributed twin (same semantics and output)
            return knn_join_distributed(
                spark,
                tiles,
                queries,
                res=res,
                n_tiles_hint=n_tiles_hint,
                checkpoint=checkpoint,
            )
    else:
        q = queries.toPandas()
    q = q[["query_id", "lon", "lat", "k"]].copy()
    shell_schema, straggler_schema, out_schema = _schemas(_qid_type(queries, q))
    if len(q) == 0:
        return spark.createDataFrame([], out_schema)

    w = Window.partitionBy("query_id").orderBy(F.col("dist_km").asc(), F.col("image_id").asc())
    from gelos_spark.plans.materialize import finalize

    if n_hint * len(q) <= brute_force_pairs:
        # small input: the cost model (previously evaluated only AFTER
        # a full cell-encode + persist + stats aggregate) says one
        # exact brute pass beats ring expansion — so take it directly:
        # no cell column, no persist, no density aggregate (none of
        # them feed the brute pass), and the top-k window runs ONCE
        # (re-ranking a single already-ranked frame is the identity).
        # Decision now keys off n_tiles_hint / count instead of the
        # measured stats["n"]; both paths are exact, so a stale hint
        # can only change the plan, never the rows.
        straggler = spark.createDataFrame(
            q[["query_id", "lon", "lat", "k"]].rename(
                columns={"lon": "qlon", "lat": "qlat"}
            ),
            straggler_schema,
        )
        brute = (
            tiles.select("image_id", "lon", "lat")
            .crossJoin(F.broadcast(straggler))
            .select(
                "query_id",
                "k",
                "image_id",
                haversine_col(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat")).alias(
                    "dist_km"
                ),
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", "image_id", "dist_km")
            .orderBy("query_id", "rank")
        )
        return finalize(brute, checkpoint)

    q["qcell"] = cells.cell_encode(q["lon"].to_numpy(), q["lat"].to_numpy(), res)

    tiles_c = (
        tiles.select("image_id", "lon", "lat")
        .withColumn("cell", cell_encode_col(F.col("lon"), F.col("lat"), res))
        .persist()
    )
    # one aggregate materializes the index AND measures density
    stats = (
        tiles_c.agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("cell").alias("occ"),
            F.min("lon").alias("lon0"),
            F.max("lon").alias("lon1"),
            F.min("lat").alias("lat0"),
            F.max("lat").alias("lat1"),
        )
        .collect()[0]
        .asDict()
    )

    if stats["n"] * len(q) <= brute_force_pairs:
        # small input (reachable only when n_tiles_hint overestimated):
        # zero ring rounds -> every query falls through to the exact
        # brute-force straggler pass below
        max_rounds = 0

    topk: DataFrame | None = None  # accumulated per-query top-k so far
    finalized: list[DataFrame] = []
    persisted: list[DataFrame] = []
    active = q
    r_prev = -1
    r_cur = _initial_radius(stats, res, int(q["k"].max()))
    rounds = 0

    while len(active) > 0 and stats["n"] > 0 and rounds < max_rounds and r_prev < n_grid:
        shell = spark.createDataFrame(_shell_pdf(active, res, r_prev, r_cur), shell_schema)
        cand = (
            F.broadcast(shell)
            .join(tiles_c, "cell")
            .select(
                "query_id",
                "qlon",
                "qlat",
                "k",
                "image_id",
                haversine_col(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat")).alias(
                    "dist_km"
                ),
            )
        )
        pool = cand if topk is None else topk.unionByName(cand)
        if 2 * r_cur + 1 > n_grid:
            # the shell's x offsets wrap the globe: wrapped cells alias
            # cells explored in earlier rounds, so the same tile can
            # enter the pool twice (x wraps; y offsets are discarded,
            # never clamped, so only x aliases). Dedup keys match the
            # window partitioning — no extra exchange shape.
            pool = pool.dropDuplicates(["query_id", "image_id"])
        topk = (
            pool.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= F.col("k"))
            .drop("rank")
            .persist()
        )
        persisted.append(topk)

        # ONE distributed action per round: per-query aggregates to the
        # driver (4 scalars per active query); bound test is driver NumPy
        qstats = topk.groupBy("query_id").agg(
            F.count("*").alias("n"),
            F.max("dist_km").alias("kth"),
            F.first("qlat").alias("qlat"),
            F.first("k").alias("kk"),
        ).collect()
        # cell_shell_batch wraps x offsets but CLAMPS y, so a radius-r
        # disk from row y only covers rows [y-r, y+r]: full-grid
        # coverage from ANY row needs r >= n_grid - 1 (2*r+1 >= n_grid
        # only guarantees the x axis) — queries near the lat edge would
        # otherwise finalize with half the grid unexplored
        whole_grid = r_cur >= n_grid - 1
        if whole_grid:
            # explored disk covers the grid: every active query is done
            # (queries with zero candidates included — empty result)
            finalized.append(topk)
            active = active.iloc[0:0]
            break
        if qstats:
            qa = np.array([[s["n"], s["kth"], s["qlat"], s["kk"]] for s in qstats])
            bound = cells.knn_bound_km(qa[:, 2], res, r_cur)
            done_ids = [
                s["query_id"]
                for s, d in zip(qstats, (qa[:, 0] >= qa[:, 3]) & (qa[:, 1] <= bound))
                if d
            ]
        else:
            done_ids = []
        if done_ids:
            finalized.append(topk.where(F.col("query_id").isin(done_ids)))
            topk = topk.where(~F.col("query_id").isin(done_ids))
            active = active[~active["query_id"].isin(done_ids)]
        rounds += 1
        r_prev, r_cur = r_cur, min(r_cur * 3, n_grid)

    if len(active) > 0:
        # stragglers: one exact brute-force pass — broadcast the few
        # unresolved queries against the tile table (complete by
        # construction, so the partial ring candidates are dropped)
        straggler = spark.createDataFrame(
            active[["query_id", "lon", "lat", "k"]].rename(
                columns={"lon": "qlon", "lat": "qlat"}
            ),
            straggler_schema,
        )
        brute = (
            tiles_c.crossJoin(F.broadcast(straggler))
            .select(
                "query_id",
                "qlon",
                "qlat",
                "k",
                "image_id",
                haversine_col(F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat")).alias(
                    "dist_km"
                ),
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .drop("rank")
        )
        finalized.append(brute)

    if not finalized:
        tiles_c.unpersist()
        return spark.createDataFrame([], out_schema)
    out = finalized[0]
    for f in finalized[1:]:
        out = out.unionByName(f)
    result = (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "image_id", "dist_km")
        .orderBy("query_id", "rank")
    )
    from gelos_spark.plans.materialize import finalize

    return finalize(result, checkpoint, caches=[tiles_c, *persisted])


def _shell_udf(res: int, r0: int, r1: int):
    """pandas_udf: query cell -> array<long> of shell cells with grid
    Chebyshev distance in (r0, r1] (the same cells.cell_shell_batch
    kernel the driver-resident path uses, now running per Arrow batch
    on executors)."""

    @F.pandas_udf("array<long>")
    def _shell(qc: pd.Series) -> pd.Series:
        arr = qc.to_numpy()
        idx, out = cells.cell_shell_batch(arr, res, r0, r1)
        counts = np.bincount(idx, minlength=len(arr))
        splits = np.split(out, np.cumsum(counts)[:-1])
        return pd.Series([s.tolist() for s in splits])

    return _shell


def _bound_km_col(qlat: F.Column, res: int, r: int) -> F.Column:
    """Column twin of cells.knn_bound_km: lower bound on the distance
    to any tile outside the explored radius-r disk."""
    n = 1 << res
    h_deg = 180.0 / n
    h_km = h_deg * cells.KM_PER_DEG_LAT_MIN
    worst_lat = F.least(F.abs(qlat) + F.lit((r + 1) * h_deg), F.lit(89.9999))
    w_km = (
        F.lit(360.0 / n * cells.KM_PER_DEG_LAT_MIN)
        * F.cos(F.radians(worst_lat))
    )
    return F.lit(float(r)) * F.least(F.lit(h_km), F.greatest(w_km, F.lit(0.0)))


def knn_join_distributed(
    spark: SparkSession,
    tiles: DataFrame,
    queries: DataFrame,
    res: int | None = None,
    n_tiles_hint: int | None = None,
    max_rounds: int = 12,
    shuffle_partitions: int | None = None,
    checkpoint: bool | str = True,
) -> DataFrame:
    """k nearest tiles per query point for CORPUS-SIZED query sets.

    Same semantics (and bit-identical output) as :func:`knn_join`, but
    the query side stays a distributed DataFrame end-to-end — use this
    when the "queries" are themselves a table (full-corpus self-kNN,
    tile-to-tile retrieval) rather than a request batch. Mirrors
    ``ivf_topk(collect_queries=False)``.

    Scale design per round (ring radius grows 3x until every query's
    k-th distance beats the unexplored-region bound):
      - shell cells come from the SAME cells.cell_shell_batch kernel,
        now a vectorized pandas UDF over the active queries;
      - tiles are shuffled ONCE into a cell-partitioned persisted
        layout; each round's shell join reuses that partitioning, so
        only the (much smaller) shell side shuffles per round;
      - the finalization bound is pure column math (no driver-side
        per-query state — the driver only sees the active COUNT);
      - queries still active once the radius covers the grid finalize
        with whatever candidates exist (k > population returns all,
        like knn_join).

    ``checkpoint``: materialization policy (plans/materialize.finalize).
    """
    if res is None:
        n_hint = n_tiles_hint if n_tiles_hint is not None else tiles.count()
        res = default_res(n_hint)
    n_grid = 1 << res
    qid_type = queries.schema["query_id"].dataType.simpleString()
    out_schema = f"query_id {qid_type}, rank int, image_id string, dist_km double"

    parts = shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    tiles_c = (
        tiles.select("image_id", "lon", "lat")
        .withColumn("cell", cell_encode_col(F.col("lon"), F.col("lat"), res))
        .repartition(parts, "cell")
        .persist()
    )
    stats = (
        tiles_c.agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("cell").alias("occ"),
            F.min("lon").alias("lon0"),
            F.max("lon").alias("lon1"),
            F.min("lat").alias("lat0"),
            F.max("lat").alias("lat1"),
        )
        .collect()[0]
        .asDict()
    )
    if stats["n"] == 0:
        tiles_c.unpersist()
        return spark.createDataFrame([], out_schema)

    active = (
        queries.select("query_id", "lon", "lat", "k")
        .withColumn("qcell", cell_encode_col(F.col("lon"), F.col("lat"), res))
        .persist()
    )
    k_max_row = active.agg(F.max("k")).collect()[0][0]
    if k_max_row is None:
        active.unpersist()
        tiles_c.unpersist()
        return spark.createDataFrame([], out_schema)

    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_km").asc(), F.col("image_id").asc()
    )
    topk: DataFrame | None = None
    finalized: list[DataFrame] = []
    persisted: list[DataFrame] = [active]
    r_prev = -1
    r_cur = _initial_radius(stats, res, int(k_max_row))
    rounds = 0

    def _dist_cand(cand: DataFrame) -> DataFrame:
        return cand.select(
            "query_id",
            "qlon",
            "qlat",
            "k",
            "image_id",
            haversine_col(
                F.col("qlon"), F.col("qlat"), F.col("lon"), F.col("lat")
            ).alias("dist_km"),
        )

    while True:
        # terminal pass: once the next ring's disk would wrap the
        # cylinder (2r+1 > n) a shell per query costs ~grid-size rows —
        # the remaining (rare by now) queries instead take one exact
        # cross-join against the tile table, the distributed twin of
        # knn_join's broadcast straggler pass. Complete by
        # construction, so the partial ring candidates are dropped.
        if rounds >= max_rounds - 1 or 2 * r_cur + 1 > n_grid:
            cand = _dist_cand(
                active.select(
                    "query_id",
                    F.col("lon").alias("qlon"),
                    F.col("lat").alias("qlat"),
                    "k",
                ).crossJoin(tiles_c.select("image_id", "lon", "lat"))
            )
            finalized.append(
                cand.withColumn("rank", F.row_number().over(w))
                .where(F.col("rank") <= F.col("k"))
                .drop("rank")
            )
            break
        shell = active.select(
            "query_id",
            F.col("lon").alias("qlon"),
            F.col("lat").alias("qlat"),
            "k",
            F.explode(_shell_udf(res, r_prev, r_cur)(F.col("qcell"))).alias("cell"),
        )
        # with 2r+1 <= n (terminal pass excludes the wrap regime) the
        # cylinder-metric shells of successive rounds are disjoint, so
        # no (query, tile) pair can enter the pool twice — no dedup
        cand = _dist_cand(shell.join(tiles_c, "cell"))
        pool = cand if topk is None else topk.unionByName(cand)
        topk = (
            pool.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= F.col("k"))
            .drop("rank")
            .persist()
        )
        persisted.append(topk)

        # distributed finalization test: a query is done when it holds
        # >= k candidates whose k-th distance beats the bound on
        # anything outside the explored disk (column math only; the
        # driver sees ONE scalar per round — the active count)
        qdone = (
            topk.groupBy("query_id")
            .agg(
                F.count("*").alias("cnt"),
                F.max("dist_km").alias("kth"),
                F.first("qlat").alias("qlat"),
                F.first("k").alias("kk"),
            )
            .where(
                (F.col("cnt") >= F.col("kk"))
                & (F.col("kth") <= _bound_km_col(F.col("qlat"), res, r_cur))
            )
            .select("query_id")
        )
        finalized.append(topk.join(qdone, "query_id", "left_semi"))
        next_active = active.join(qdone, "query_id", "left_anti").persist()
        persisted.append(next_active)
        n_active = next_active.count()
        topk = topk.join(qdone, "query_id", "left_anti")
        active = next_active
        if n_active == 0:
            break
        rounds += 1
        r_prev, r_cur = r_cur, min(r_cur * 3, n_grid)

    out = finalized[0]
    for f in finalized[1:]:
        out = out.unionByName(f)
    result = (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "image_id", "dist_km")
        .orderBy("query_id", "rank")
    )
    from gelos_spark.plans.materialize import finalize

    return finalize(result, checkpoint, caches=[tiles_c, *persisted])
