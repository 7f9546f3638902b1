"""Join helpers for skewed keys at cluster scale.

AQE's skew-join splitting handles sort-merge skew automatically; this
module adds the explicit *salted* formulation for cases AQE can't
rewrite (e.g. aggregations after the join keyed on the skewed column,
or forced shuffle-hash joins).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SinglePartitionAsofWarning(UserWarning):
    """asof_join planned a keyless (single-partition) sort — correct
    but serial; see the asof_join docstring for the banded scale
    formulation."""


#: combined plan-stat size (bytes) above which a keyless asof_join
#: re-routes itself through :func:`asof_join_banded` instead of
#: warning about the single-partition sort. Below it the serial plan
#: is genuinely cheaper (no band shuffle, no min/max pre-scan) and the
#: warning still fires. The env var is read ONCE at import (set it
#: before the process starts); at runtime patch the module attribute.
ASOF_AUTO_BAND_MIN_BYTES = int(
    os.environ.get(
        "PYSTORE_ASOF_AUTO_BAND_MIN_BYTES", 256 * 1024 * 1024
    )
)
#: Catalyst returns spark.sql.defaultSizeInBytes (Long.MaxValue) for
#: stat-less relations (JDBC, LogicalRDD) — an estimate that large
#: means "unknown", not "huge"; treat it as unavailable so tiny
#: stat-less frames keep the lazy serial plan instead of eagerly
#: running min/max jobs
_SIZE_ESTIMATE_CEILING = 1 << 62
#: how many time bands the auto-router aims for — enough parallelism
#: to keep 32-wide executors busy with headroom for skewed bands,
#: small enough that the carry pass (one row per band) stays
#: metadata-scale
ASOF_AUTO_BAND_TARGET_BANDS = 256


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for the frame — planning-time
    only (no job). None when plan introspection is unavailable
    (Connect)."""
    try:
        size = int(
            str(
                df._jdf.queryExecution().optimizedPlan().stats()
                .sizeInBytes()
            )
        )  # py4j yields int or java BigInt
    except Exception:
        return None
    return None if size >= _SIZE_ESTIMATE_CEILING else size


def _auto_band_seconds(
    left: DataFrame, right: DataFrame, on: str, r_on: str
) -> int | None:
    """Band width for the keyless-asof auto-router: None when the
    combined Catalyst size estimate is under
    :data:`ASOF_AUTO_BAND_MIN_BYTES` (or unavailable) — the caller
    keeps the warned single-partition plan. Above it, one min/max
    aggregation over each side (column-pruned scans; parquet footer
    stats make them near-free) sizes the time axis, and the width
    targets :data:`ASOF_AUTO_BAND_TARGET_BANDS` bands."""
    ls, rs = _plan_size_bytes(left), _plan_size_bytes(right)
    if ls is None or rs is None:
        return None
    if ls + rs < ASOF_AUTO_BAND_MIN_BYTES:
        return None

    def rng(df: DataFrame, col: str) -> tuple[int, int] | None:
        c = F.col(col)
        if dict(df.dtypes).get(col) in ("timestamp", "timestamp_ntz"):
            c = c.cast("timestamp").cast("long")
        else:
            c = c.cast("double")
        row = df.select(
            F.min(c).alias("lo"), F.max(c).alias("hi")
        ).first()
        if row is None or row["lo"] is None:
            return None
        return int(row["lo"]), int(row["hi"])

    try:
        lr, rr = rng(left, on), rng(right, r_on)
    except Exception:
        # time key the band math can't handle (DateType, strings
        # under ANSI, ...) — keep the warned serial plan, which is
        # correct for any orderable type
        return None
    spans = [s for s in (lr, rr) if s is not None]
    if not spans:
        return None  # both sides empty — serial plan is free anyway
    lo = min(s[0] for s in spans)
    hi = max(s[1] for s in spans)
    width = (hi - lo + 1 + ASOF_AUTO_BAND_TARGET_BANDS - 1) // (
        ASOF_AUTO_BAND_TARGET_BANDS
    )
    return max(1, int(width))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Join a skewed large side against ``other`` by salting: the
    skewed side gets a random salt in [0, num_salts); ``other`` is
    replicated once per salt, so each hot key spreads over
    ``num_salts`` reducers instead of one.

    Use when one/few keys dominate (power-law user ids, null-ish
    defaults). Cost: ``other`` is shuffled ``num_salts``×, so keep it
    the smaller side.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted = skewed.withColumn(
        "_salt", (F.rand(seed) * num_salts).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted.join(replicated, on + ["_salt"], how).drop("_salt")


def banded_interval_join(
    intervals: DataFrame,
    probe: DataFrame,
    start_col: str,
    end_col: str,
    time_col: str,
    band_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Interval join (probe.ts ∈ [start, end)) without an equi-key,
    made shuffle-joinable by banding the time axis: each interval
    replicates to every ``band_seconds`` band it overlaps, each probe
    row lands in exactly one band, so band equality + the residual
    range predicate becomes an equi-join Catalyst can hash/sort-merge.
    Without the band the only physical plan is BroadcastNestedLoopJoin
    (driver-OOM at scale) or a cartesian product.

    Each matching (interval, probe) pair appears exactly once: the
    probe's band is unique, so only the interval replica in that band
    can pair with it. Choose ``band_seconds`` ≈ the typical interval
    length — shorter bands replicate intervals more; longer bands put
    more non-matching rows in each band.

    Column names must be disjoint between the two frames. ``how`` may
    be ``inner`` or ``left`` (left keeps intervals with no probe rows;
    an interval spanning b bands yields b null-extended rows, so
    aggregate with null-skipping functions like ``count(col)``).
    """
    overlap = set(intervals.columns) & set(probe.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, both have {sorted(overlap)}")
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"banded_interval_join supports inner/left, got {how!r}")

    def band_of(col: F.Column) -> F.Column:
        # TIMESTAMP_NTZ has no direct → BIGINT cast; route through LTZ
        # (session tz is pinned to UTC, so NTZ epoch == DuckDB's epoch()).
        return F.floor(col.cast("timestamp").cast("long") / band_seconds).cast(
            "long"
        )

    iv = intervals.withColumn(
        "_band",
        F.explode(
            F.sequence(
                band_of(F.col(start_col)),
                # end is exclusive: a range end exactly on a band edge
                # never matches inside that band
                band_of(F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND")),
            )
        ),
    )
    pr = probe.withColumn("_band", band_of(F.col(time_col)))
    cond = (
        (iv["_band"] == pr["_band"])
        & (pr[time_col] >= iv[start_col])
        & (pr[time_col] < iv[end_col])
    )
    return iv.join(pr, cond, how).drop("_band")


def salted_count_per_key(
    df: DataFrame, key_cols: list[str], num_salts: int = 16, seed: int = 42
) -> DataFrame:
    """Two-stage (salted partial → final) count for heavily skewed
    group-by keys — the classic map-side-combine-resistant case is a
    count over exploded data where one key holds most rows."""
    salted = df.withColumn("_salt", (F.rand(seed) * num_salts).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").alias("n")
    )


def asof_join_banded(
    left: DataFrame,
    right: DataFrame,
    on: str,
    band_seconds: int,
    right_on: str | None = None,
    values: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    right_time_as: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """KEYLESS as-of join at scale — the banded fallback the plain
    :func:`asof_join` warning points at. The time axis becomes a
    synthetic equi-key (``floor(t / band_seconds)``, the
    banded_interval_join trick) so the window pass partitions by band
    instead of sorting both frames in ONE partition. Exactness across
    band edges comes from **carry-in replicas**: for every band the
    probe side occupies, the single latest build row from any EARLIER
    band (backward; mirrored for forward; both for nearest) is
    replicated into the band, so the in-band window sees exactly the
    rows the global sort would pick.

    Cost: one shuffle of each side on the band key + one band-count-
    sized single-partition window to derive the carries (metadata-
    scale: one row per band, never corpus-scale). Choose
    ``band_seconds`` so a band holds thousands-to-millions of rows —
    parallelism is the number of bands.

    Carry soundness: a carry row's time lies strictly BEFORE its
    target band's start (its band is strictly smaller), so it sorts
    before every in-band probe row and can never win over an in-band
    match; symmetrically forward carries sort strictly after. The
    per-band latest-then-running-last construction guarantees there
    is no build row between a carry and its target band's start.
    merge_asof parity is pinned in tests/test_asof_join.py."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward|forward|nearest")
    if band_seconds <= 0:
        raise ValueError("band_seconds must be positive")
    from pyspark.sql import Window

    r_on = right_on or on
    bk = "_bandk_asof"
    clash = {
        bk, "_bandsrc_asof", "_rl_asof", "_rf_asof", "_crow_asof",
    } & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"column name(s) {sorted(clash)} collide with "
            "asof_join_banded's working columns — rename them"
        )

    def _band(df, col):
        c = F.col(col)
        if dict(df.dtypes).get(col) in ("timestamp", "timestamp_ntz"):
            c = c.cast("timestamp").cast("long")
        return F.floor(c / F.lit(band_seconds)).cast("long")

    left_b = left.withColumn(bk, _band(left, on))
    right_b = right.withColumn(bk, _band(right, r_on))
    probe_bands = left_b.select(bk).distinct()

    # per-band latest AND earliest build rows from ONE shuffle of the
    # build side (two row_numbers share the band partitioning — one
    # Exchange, two sorts); `nearest` would otherwise shuffle the
    # build side twice for its two carry directions
    _ranked = right_b.withColumn(
        "_rl_asof",
        F.row_number().over(
            Window.partitionBy(bk).orderBy(F.col(r_on).desc())
        ),
    ).withColumn(
        "_rf_asof",
        F.row_number().over(
            Window.partitionBy(bk).orderBy(F.col(r_on).asc())
        ),
    )

    def _carries(back: bool) -> DataFrame:
        """One replica per probe band: the latest (earliest, when
        ``back=False``) build row of any strictly earlier (later)
        band — derived from one per-band reduction of the build side
        plus a band-count-sized running pass."""
        per_band = _ranked.filter(
            (F.col("_rl_asof") if back else F.col("_rf_asof")) == 1
        ).drop("_rl_asof", "_rf_asof")
        src = F.lit(0)  # build rows
        tagged = per_band.withColumn("_bandsrc_asof", src).unionByName(
            probe_bands.withColumn("_bandsrc_asof", F.lit(1)),
            allowMissingColumns=True,
        )
        # probe markers order BEFORE (after, forward) same-band build
        # rows, so the running pick only sees STRICTLY earlier (later)
        # bands — a same-band carry would duplicate an in-band row and
        # could flip equal-time tie resolution. Band-count-sized
        # single partition by design.
        if back:
            w = Window.orderBy(
                F.col(bk).asc(), F.col("_bandsrc_asof").desc()
            ).rowsBetween(Window.unboundedPreceding, -1)
        else:
            w = Window.orderBy(
                F.col(bk).asc(), F.col("_bandsrc_asof").asc()
            ).rowsBetween(1, Window.unboundedFollowing)
        pick = F.last if back else F.first
        # carry ONE whole row as a struct — per-column picks with
        # ignorenulls would back-fill a NULL value in the boundary
        # row from an older band's row, fabricating a row that never
        # existed (the same rule as one_side's payload pick)
        payload = F.when(
            F.col("_bandsrc_asof") == 0,
            F.struct(*[F.col(c) for c in right.columns]),
        )
        carried = tagged.withColumn(
            "_crow_asof", pick(payload, ignorenulls=True).over(w)
        )
        return (
            carried.filter(F.col("_bandsrc_asof") == 1)
            .select(
                F.col(bk),
                *[
                    F.col(f"_crow_asof.{c}").alias(c)
                    for c in right.columns
                ],
            )
            .filter(F.col(r_on).isNotNull())
        )

    aug = right_b
    if direction in ("backward", "nearest"):
        aug = aug.unionByName(_carries(back=True))
    if direction in ("forward", "nearest"):
        aug = aug.unionByName(_carries(back=False))

    out = asof_join(
        left_b,
        aug,
        on,
        right_on=right_on,
        by=[bk],
        values=values
        if values is not None
        else [c for c in right.columns if c != r_on],
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=allow_exact_matches,
        right_time_as=right_time_as,
        suffix=suffix,
    )
    return out.drop(bk)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str | None = None,
    by: list[str] | None = None,
    right_by: list[str] | None = None,
    values: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    right_time_as: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Distributed as-of join — pandas ``merge_asof`` semantics as ONE
    window pass (the plan behind the asof_join_orders_events oracle
    query, generalized to any frames/columns):

    tag both sides, union them, and for every probe row take the
    last (``direction="backward"``: right time <= left time) or first
    (``"forward"``: right time >= left time) right row per ``by``
    group via ``last/first(..., ignorenulls=True)`` over a running
    window. Cost: ONE shuffle on the ``by`` keys + one sort — never a
    per-row subquery, never a range join; the 100 TB formulation.

    * ``values`` — right columns to carry (default: everything except
      its time/key columns); name collisions with left get ``suffix``.
    * ``tolerance`` — max distance: an INTERVAL string ("3 days",
      "15 minutes") for timestamp keys or a number for numeric keys;
      matches farther away null out (the carried time too).
    * ``allow_exact_matches=False`` — strict inequality at equal time.
    * ``right_time_as`` — also emit the matched right timestamp under
      this name.
    * ``direction="nearest"`` — whichever side is closer (tie →
      backward, matching pandas); computed as the backward and forward
      passes over the SAME key partitioning (one shuffle, two sorts)
      and a distance compare. Tolerance nulls each side independently
      before choosing, so an out-of-tolerance nearest row falls back
      to an in-tolerance farther one — merge_asof-verified.

    .. warning:: With no ``by`` keys the window is
       ``Window.partitionBy()`` — ONE partition sorting both frames
       end-to-end, matching keyless ``merge_asof`` semantics but
       serial at scale. Above
       :data:`ASOF_AUTO_BAND_MIN_BYTES` (combined Catalyst size
       estimate; env ``PYSTORE_ASOF_AUTO_BAND_MIN_BYTES``) the call
       re-routes itself through :func:`asof_join_banded`
       automatically — output-identical, time axis banded into
       :data:`ASOF_AUTO_BAND_TARGET_BANDS` synthetic equi-keys with
       exact carry-in handling, at the cost of one min/max pre-scan
       per side to size the bands. Below the threshold — or when the
       size is UNKNOWN (stat-less relations like JDBC/RDD-backed
       frames report defaultSizeInBytes) or the time type has no band
       arithmetic (DateType) — the serial plan is kept and a
       ``SinglePartitionAsofWarning`` is emitted so it can't ship
       silently; call :func:`asof_join_banded` explicitly to band a
       frame the router can't size.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward|forward|nearest")
    from pyspark.sql import Window

    r_on = right_on or on
    by = list(by or [])
    r_by = list(right_by if right_by is not None else by)
    if len(by) != len(r_by):
        raise ValueError("by and right_by must have equal length")
    if not by:
        # auto-band above the size threshold: the banded plan is
        # output-identical (merge_asof parity pinned for both paths in
        # tests/test_asof_join.py), so re-routing is a pure physical
        # rewrite — the single-partition sort can't ship at scale
        # even when the caller ignores warnings
        auto = _auto_band_seconds(left, right, on, r_on)
        if auto is not None:
            return asof_join_banded(
                left,
                right,
                on,
                band_seconds=auto,
                right_on=right_on,
                values=values,
                direction=direction,
                tolerance=tolerance,
                allow_exact_matches=allow_exact_matches,
                right_time_as=right_time_as,
                suffix=suffix,
            )
        import warnings

        warnings.warn(
            "asof_join with no `by` keys plans a SINGLE-PARTITION "
            "sort over both frames (correct, serial). At scale, use "
            "asof_join_banded, which bands the time axis into a "
            "synthetic `by` key with exact edge handling.",
            SinglePartitionAsofWarning,
            stacklevel=2,
        )
    # the pass builds _asof_* working columns; input columns under
    # those names would be silently overwritten into wrong matches
    reserved = [
        c
        for c in set(left.columns) | set(right.columns)
        if c.startswith("_asof_")
    ]
    if reserved:
        raise ValueError(
            f"column name(s) {sorted(reserved)} collide with "
            "asof_join's reserved `_asof_*` working columns — rename "
            "them before joining"
        )
    if values is None:
        values = [
            c for c in right.columns if c not in (*r_by, r_on)
        ]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in values
    }
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    probe = left.withColumn("_asof_probe", F.lit(1)).withColumn(
        "_asof_t", F.col(on)
    )
    for c in values:
        probe = probe.withColumn(
            out_names[c], F.lit(None).cast(rtypes[c])
        )
    build = right.select(
        *[F.col(rc).alias(lc) for lc, rc in zip(by, r_by)],
        F.col(r_on).alias("_asof_t"),
        *[F.col(c).alias(out_names[c]) for c in values],
    ).withColumn("_asof_probe", F.lit(0))
    for c in left.columns:
        if c not in build.columns:
            build = build.withColumn(c, F.lit(None).cast(ltypes[c]))
    unioned = probe.unionByName(build.select(*probe.columns))

    build_only = lambda c: F.when(  # noqa: E731
        F.col("_asof_probe") == 0, F.col(c)
    )
    build_only_struct = lambda s: F.when(  # noqa: E731
        F.col("_asof_probe") == 0, s
    )

    def one_side(df, back: bool, tag: str):
        """Apply one directional pass, adding `_asof_rt{tag}` and
        `{out}{tag}` matched columns. The tie order at equal _t
        decides exact-match semantics: the build row must fall inside
        the probe's frame iff exact matches count.

        The matched row is picked as ONE struct, never per column:
        per-column last/first(..., ignorenulls) would back-fill a
        NULL value in the matched row from an OLDER row — a synthetic
        row that never existed (merge_asof carries the matched row's
        NULLs verbatim)."""
        build_first = back == allow_exact_matches
        tie = (
            F.col("_asof_probe").asc()
            if build_first
            else F.col("_asof_probe").desc()
        )
        w = Window.partitionBy(*by).orderBy(F.col("_asof_t").asc(), tie)
        if back:
            w = w.rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731
        else:
            w = w.rowsBetween(
                Window.currentRow, Window.unboundedFollowing
            )
            pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
        payload = F.struct(
            F.col("_asof_t").alias("_t"),
            *[
                F.col(out_names[c]).alias(f"_v{i}")
                for i, c in enumerate(values)
            ],
        )
        row = pick(build_only_struct(payload)).over(w)
        df = df.withColumn(f"_asof_row{tag}", row).withColumn(
            f"_asof_rt{tag}", F.col(f"_asof_row{tag}._t")
        )
        for i, c in enumerate(values):
            df = df.withColumn(
                f"{out_names[c]}{tag}",
                F.col(f"_asof_row{tag}._v{i}"),
            )
        return df.drop(f"_asof_row{tag}")

    def tol_ok(back: bool, rt):
        if isinstance(tolerance, str):
            bound = F.expr(f"INTERVAL {tolerance}")
        else:
            bound = F.lit(tolerance)
        lo = (
            F.col("_asof_t") - bound if back else F.col("_asof_t") + bound
        )
        return rt >= lo if back else rt <= lo

    if direction in ("backward", "forward"):
        back = direction == "backward"
        matched = one_side(unioned, back, "")
        out = matched.filter(F.col("_asof_probe") == 1)
        if tolerance is not None:
            ok = tol_ok(back, F.col("_asof_rt"))
            for c in [out_names[c] for c in values] + ["_asof_rt"]:
                out = out.withColumn(c, F.when(ok, F.col(c)))
    else:  # nearest: both passes share the key partitioning
        matched = one_side(one_side(unioned, True, "_b"), False, "_f")
        out = matched.filter(F.col("_asof_probe") == 1)
        bt, ft = F.col("_asof_rt_b"), F.col("_asof_rt_f")
        if tolerance is not None:
            b_ok = bt.isNotNull() & tol_ok(True, bt)
            f_ok = ft.isNotNull() & tol_ok(False, ft)
        else:
            b_ok, f_ok = bt.isNotNull(), ft.isNotNull()
        # distances compare in the NATIVE domain: timestamp/date
        # subtraction yields comparable intervals and long/decimal
        # keys subtract exactly — a double cast would reject DateType
        # outright and lose precision past 2^53 (int64 ns epochs)
        td = F.col("_asof_t")
        pick_b = b_ok & (~f_ok | ((td - bt) <= (ft - td)))
        for c in [out_names[c] for c in values] + ["_asof_rt"]:
            b, f_ = (
                (f"{c}_b", f"{c}_f")
                if c != "_asof_rt"
                else ("_asof_rt_b", "_asof_rt_f")
            )
            out = out.withColumn(
                c,
                F.when(pick_b, F.col(b)).when(f_ok, F.col(f_)),
            )
    if right_time_as:
        out = out.withColumn(right_time_as, F.col("_asof_rt"))
    keep = list(left.columns) + [out_names[c] for c in values] + (
        [right_time_as] if right_time_as else []
    )
    return out.select(*keep)
