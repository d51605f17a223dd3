"""Stream-shaped operators over the ordered ``events`` log
(``event_id, ts, user_id, event_type, value, props``).

Ray Data has no event-time windowing; per the engine's design rules the
input is treated as a partitioned ordered log: windows are computed as
vectorized batch transforms + a keyed groupby, sessions as one vectorized
numpy scan per coarse user-hash partition (ordering assumption: within a
user, (ts, event_id) is a total order — both the engine and the SQL
oracle sort by it).

Money-valued sums are carried as integer cents (``round(value*100)``) so
distributed partial-sum order can never produce float drift vs the
oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum


def _cents(value_col) -> pa.Array:
    """Exact integer cents, HALF-AWAY-FROM-ZERO (DuckDB ``round()``
    semantics — Arrow's ``pc.round`` defaults to half-to-even, which
    disagrees on exact .5 products like 1.125*100 and would break the
    value-exact oracles). Guarded at |cents| < 2^32: the percentile
    key packing reserves 33 bits for the signed cents field."""
    v = value_col.to_numpy(zero_copy_only=False).astype(np.float64) * 100.0
    c = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(
        np.int64)
    if c.size and int(np.abs(c).max()) >= (1 << 32):
        raise ValueError(
            "event value exceeds the 2^32-cent packing range "
            "(~$42.9M) — rescale before windowing")
    return pa.array(c, type=pa.int64())


def _check_epoch_nonneg(ts_int64) -> None:
    """The window/session operators divide epoch integers, and their
    SQL oracles mix flooring (date_trunc) and truncating (//) division
    — the two agree only for NON-NEGATIVE epochs, so pre-1970
    timestamps are out of contract and raise rather than silently
    diverging per operator."""
    arr = ts_int64 if isinstance(ts_int64, np.ndarray) else (
        ts_int64.to_numpy(zero_copy_only=False))
    if arr.size and int(arr.min()) < 0:
        raise ValueError(
            "pre-epoch (negative) timestamps are outside the window "
            "operators' division contract — shift or filter them first")


def _fix_ts_unit(col: str):
    """Ray's groupby normalizes timestamp keys to timestamp[s]; restore
    µs so the schema matches the DuckDB oracle exactly."""
    def fn(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index(col)
        return t.set_column(i, col, t[col].cast(pa.timestamp("us")))
    return fn


def tumbling_window_agg(ds: Dataset, window_sec: int = 3600) -> Dataset:
    """Per (user_id, tumbling window): event count, exact value-cents sum,
    min/max event ids. Window start is the epoch-truncated timestamp.

    Partial aggregation happens implicitly per batch via the vectorized
    window computation; the groupby shuffles one row per input row here
    (counts are small) — at scale, add a per-batch combine first.
    """

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())  # µs since epoch
        _check_epoch_nonneg(ts)
        win = pc.multiply(
            pc.divide(ts, 1_000_000 * window_sec), 1_000_000 * window_sec)
        return pa.table({
            "user_id": batch["user_id"],
            "window_start": win.cast(pa.timestamp("us")),
            "value_cents": _cents(batch["value"]),
            "event_id": batch["event_id"],
        })

    return (ds.map_batches(add_window, batch_format="pyarrow")
            .groupby(["user_id", "window_start"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value_cents", alias_name="value_cents"),
                       Min("event_id", alias_name="first_event"),
                       Max("event_id", alias_name="last_event"))
            .map_batches(_fix_ts_unit("window_start"),
                         batch_format="pyarrow"))


def hopping_window_agg(ds: Dataset, window_sec: int = 3600,
                       hop_sec: int = 900) -> Dataset:
    """Overlapping (hopping) windows: every event lands in the
    ``window_sec / hop_sec`` windows covering it. Per (user_id,
    window_start): event count and exact value-cents sum.

    Vectorized explode (one tiled copy per hop offset — the fan-out
    factor is the window/hop ratio, a constant) + the same keyed
    groupby as the tumbling path. ``window_sec`` must be a multiple of
    ``hop_sec``.
    """
    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    k = window_sec // hop_sec

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)  # µs
        _check_epoch_nonneg(ts)
        hop_us = 1_000_000 * hop_sec
        base = (ts // hop_us) * hop_us  # latest hop-aligned start ≤ ts
        offs = (np.arange(k, dtype=np.int64) * hop_us)[:, None]
        win = (base[None, :] - offs).ravel()
        cents = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": pa.array(np.tile(
                batch["user_id"].to_numpy(zero_copy_only=False), k)),
            "window_start": pa.array(win).cast(pa.timestamp("us")),
            "value_cents": pa.array(np.tile(cents, k)),
        })

    return (ds.map_batches(explode, batch_format="pyarrow")
            .groupby(["user_id", "window_start"])
            .aggregate(Count(alias_name="n_events"),
                       Sum("value_cents", alias_name="value_cents"))
            .map_batches(_fix_ts_unit("window_start"),
                         batch_format="pyarrow"))


def sessionize(ds: Dataset, gap_sec: int = 1800,
               num_parts: int | None = None) -> Dataset:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds ``gap_sec``. Output per user:
    (user_id, n_sessions, n_events, max_session_events).

    Scale shape: group by a coarse user-hash partition (``num_parts``
    groups, not one group per user — per-group Python dispatch measured
    13.7× slower in the r1 postings build) and run one vectorized numpy
    session scan per partition: sort by (user, t, event_id), mark
    boundaries with diffs, aggregate per user with bincount/reduceat.
    ``num_parts=None`` derives the partition count from the input size
    (:func:`.partitioning.auto_num_parts`).
    """
    from .partitioning import auto_num_parts

    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def add_part(batch: pa.Table) -> pa.Table:
        part = pc.cast(
            pc.bit_wise_and(batch["user_id"], num_parts - 1), pa.int32())
        ts = batch["ts"].cast(pa.int64())
        _check_epoch_nonneg(ts)  # pc.divide truncates, oracle floors
        return pa.table({
            "part": part,
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            # second-resolution time, identical to the oracle's
            # floor(epoch(ts))::BIGINT for non-negative epochs
            "t": pc.divide(ts, 1_000_000),
        })

    def per_part(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        t = g["t"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t, u))
        u, t = u[order], t[order]
        n = len(u)
        user_change = np.ones(n, dtype=bool)
        user_change[1:] = u[1:] != u[:-1]
        new_session = user_change.copy()
        new_session[1:] |= (t[1:] - t[:-1]) > gap_sec
        # contiguous codes for users and sessions (sessions nest in users)
        ucode = np.cumsum(user_change) - 1
        scode = np.cumsum(new_session) - 1
        session_len = np.bincount(scode)
        # first session index of each user → per-user max via reduceat
        user_first_session = scode[user_change]
        max_len = np.maximum.reduceat(session_len, user_first_session)
        return pa.table({
            "user_id": pa.array(u[user_change], type=pa.int64()),
            "n_sessions": pa.array(
                np.bincount(ucode, weights=new_session).astype(np.int64)),
            "n_events": pa.array(np.bincount(ucode).astype(np.int64)),
            "max_session_events": pa.array(max_len.astype(np.int64)),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(per_part, batch_format="pyarrow"))


def asof_join_prior(ds: Dataset, left_type: str = "purchase",
                    right_type: str = "view",
                    num_parts: int | None = None) -> Dataset:
    """Distributed AS-OF join — for every *left_type* event, the most
    recent *right_type* event of the SAME user at-or-before its
    timestamp: (event_id, user_id, matched_event_id), inner semantics
    (lefts with no prior right are dropped), deterministic tie-break at
    equal timestamps (highest matched event_id).

    Ray Data has no asof join; this is the partitioned merge-scan shape:
    both sides ride ONE coarse user-hash shuffle, and each partition runs
    a single vectorized pass — sort the union by (user, ts, kind, id)
    with rights before lefts at equal ts (inclusive bound), forward-fill
    the last right position via ``np.maximum.accumulate``, and null out
    fills that crossed a user boundary. O(n log n) per partition, no
    per-user dispatch, no O(lefts × rights) pair pass (the SQL oracle
    pays that instead)."""
    from .partitioning import auto_num_parts

    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def add_part(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array([left_type, right_type]))
        t = batch.filter(keep)
        return pa.table({
            "part": pc.cast(pc.bit_wise_and(t["user_id"], num_parts - 1),
                            pa.int32()),
            "user_id": t["user_id"],
            "ts": t["ts"],
            "event_id": t["event_id"],
            "is_left": pc.equal(t["event_type"], left_type),
        })

    def scan(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        left = group["is_left"].to_numpy(zero_copy_only=False)
        n = len(u)
        # rights sort before lefts at equal (user, ts); ties within a
        # side break by event_id so the LAST right at a ts is the max id
        order = np.lexsort((eid, left, ts, u))
        u, ts, eid, left = u[order], ts[order], eid[order], left[order]
        last_right = np.maximum.accumulate(
            np.where(~left, np.arange(n), -1))
        li = np.flatnonzero(left)
        fills = last_right[li]
        ok = fills >= 0
        # a fill that carried across a user boundary is not a match
        ok[ok] = u[fills[ok]] == u[li[ok]]
        li = li[ok]
        return pa.table({
            "event_id": pa.array(eid[li], type=pa.int64()),
            "user_id": pa.array(u[li], type=pa.int64()),
            "matched_event_id": pa.array(eid[last_right[li]],
                                         type=pa.int64()),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(scan, batch_format="pyarrow"))


def range_join_count(ds: Dataset, left_type: str = "purchase",
                     right_type: str = "view", window_sec: int = 3600,
                     num_parts: int | None = None) -> Dataset:
    """Distributed RANGE (interval) join, counting form — for every
    *left_type* event, how many *right_type* events of the same user
    fall in ``[ts - window_sec, ts]``: (event_id, user_id, n_matched),
    zeros included. Ray Data has no range join; like
    :func:`asof_join_prior` this is one coarse user-hash shuffle + a
    vectorized per-partition scan — here the count is a DIFFERENCE OF
    TWO CUMULATIVES over the sorted union (rights at-or-before the upper
    bound, minus rights strictly before the lower bound), so cost stays
    O(n log n) per partition while the join's output pairs (which the
    SQL oracle materializes) can be O(lefts × rights)."""
    from .partitioning import auto_num_parts

    if num_parts is None:
        num_parts = auto_num_parts(ds)
    w_us = np.int64(window_sec) * 1_000_000

    def add_part(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array([left_type, right_type]))
        t = batch.filter(keep)
        return pa.table({
            "part": pc.cast(pc.bit_wise_and(t["user_id"], num_parts - 1),
                            pa.int32()),
            "user_id": t["user_id"],
            "ts": t["ts"],
            "event_id": t["event_id"],
            "is_left": pc.equal(t["event_type"], left_type),
        })

    def scan(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        left = group["is_left"].to_numpy(zero_copy_only=False)
        n = len(u)

        def cum_at(key_left: np.ndarray, lefts_first: bool) -> np.ndarray:
            """#same-user rights at-or-before each left's key (rights at
            an EQUAL key count iff lefts sort after them), returned in
            the lefts' original row order."""
            key = np.where(left, key_left, ts)
            kind = left != lefts_first  # False sorts first
            order = np.lexsort((kind, key, u))
            uo, lo = u[order], left[order]
            cnt = np.cumsum(~lo)  # rights up to and incl. each position
            newu = np.ones(n, dtype=bool)
            newu[1:] = uo[1:] != uo[:-1]
            # rights before each user's first row; nondecreasing across
            # users, so a maximum.accumulate forward-fills it per row
            start_val = cnt - (~lo).astype(np.int64)
            base = np.maximum.accumulate(np.where(newu, start_val, -1))
            per_left = (cnt - base)[lo]
            # order[lo] = original index of each sorted left; sorting it
            # ascending restores the original left order
            return per_left[np.argsort(order[lo], kind="stable")]

        upper = cum_at(ts, lefts_first=False)        # v.ts <= p.ts
        lower = cum_at(ts - w_us, lefts_first=True)  # v.ts <  p.ts - w
        return pa.table({
            "event_id": pa.array(eid[left], type=pa.int64()),
            "user_id": pa.array(u[left], type=pa.int64()),
            "n_matched": pa.array(upper - lower),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(scan, batch_format="pyarrow"))


RANGE_JOIN_SQL = """
    with l as (select event_id, user_id, ts from events
               where event_type = 'purchase'),
    r as (select user_id, ts from events where event_type = 'view')
    select l.event_id, l.user_id,
           count(r.ts)::BIGINT as n_matched
    from l left join r
      on r.user_id = l.user_id
     and r.ts <= l.ts
     and r.ts >= l.ts - INTERVAL 3600 SECONDS
    group by l.event_id, l.user_id"""


ASOF_SQL = """
    with l as (select event_id, user_id, ts from events
               where event_type = 'purchase'),
    r as (select event_id, user_id, ts from events
          where event_type = 'view'),
    j as (select l.event_id, l.user_id, r.event_id as matched_event_id,
                 row_number() over (partition by l.event_id
                                    order by r.ts desc, r.event_id desc)
                     as rn
          from l join r on r.user_id = l.user_id and r.ts <= l.ts)
    select event_id, user_id, matched_event_id from j where rn = 1"""


def event_value_percentiles(ds: Dataset,
                            ps: tuple[float, ...] = (0.5, 0.9, 0.99)
                            ) -> Dataset:
    """Exact per-event_type value percentiles (p50/p90/p99 over integer
    cents) — the distributed-quantile shape done EXACTLY, not with a
    sketch: per-batch (event_type, cents) histogram partials → one
    ``groupby`` merge of the (small, bounded-domain) histogram → a
    per-type vectorized cumulative scan. Shuffle size is O(distinct
    cents per type), never O(rows); semantics ≡ SQL ``percentile_disc``
    (1-based index ⌈p·n⌉ into the sorted values)."""

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist())
        types, codes = np.unique(et, return_inverse=True)
        cents = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        key = codes.astype(np.int64) * (1 << 33) + (cents + (1 << 32))
        uk, n = np.unique(key, return_counts=True)
        return pa.table({
            "event_type": pa.array(types[(uk >> 33)].tolist(),
                                   type=pa.string()),
            "cents": pa.array((uk & ((1 << 33) - 1)) - (1 << 32),
                              type=pa.int64()),
            "n": pa.array(n.astype(np.int64)),
        })

    hist = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "cents"])
            .aggregate(Sum("n", alias_name="n")))

    def scan(group: pa.Table) -> pa.Table:
        cents = group["cents"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(cents)
        cents, n = cents[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        cols = {"event_type": pa.array([group["event_type"][0].as_py()]),
                "n_events": pa.array([total], type=pa.int64())}
        for p in ps:
            idx = max(1, int(np.ceil(p * total)))  # percentile_disc
            v = cents[np.searchsorted(cum, idx, side="left")]
            cols[f"p{int(p * 100)}_c"] = pa.array([int(v)], type=pa.int64())
        return pa.table(cols)

    # few event types → per-group dispatch is not a hot path here
    return hist.groupby("event_type").map_groups(scan,
                                                 batch_format="pyarrow")


PERCENTILES_SQL = """
    select event_type,
           count(*) as n_events,
           percentile_disc(0.5) within group
               (order by cast(round(value*100) as bigint))::BIGINT as p50_c,
           percentile_disc(0.9) within group
               (order by cast(round(value*100) as bigint))::BIGINT as p90_c,
           percentile_disc(0.99) within group
               (order by cast(round(value*100) as bigint))::BIGINT as p99_c
    from events group by event_type"""


# Oracle for window_sec=3600 (date_trunc avoids to_timestamp's
# TIMESTAMPTZ/session-timezone hazards; both sides floor naive time).
TUMBLING_HOUR_SQL = """
    select user_id,
           date_trunc('hour', ts) as window_start,
           count(*) as n_events,
           sum(cast(round(value * 100) as bigint))::BIGINT as value_cents,
           min(event_id) as first_event,
           max(event_id) as last_event
    from events group by 1, 2"""

# Oracle for hopping windows: every event joins the window/hop
# hop-aligned starts covering it (make_timestamp takes epoch µs).
HOPPING_SQL = """
    with hop as (select unnest(range(0, {k})) as j),
    ev as (
      select user_id,
             cast(round(value * 100) as bigint) as cents,
             (epoch_us(ts) // {hop_us}) * {hop_us} as base
      from events)
    select user_id,
           make_timestamp(base - j * {hop_us}) as window_start,
           count(*) as n_events,
           sum(cents)::BIGINT as value_cents
    from ev, hop group by 1, 2"""

SESSIONIZE_SQL = """
    with ordered as (
      select user_id, event_id, floor(epoch(ts))::BIGINT as t,
             lag(floor(epoch(ts))::BIGINT) over
                 (partition by user_id order by ts, event_id) as prev_t
      from events),
    marked as (
      select user_id, event_id, t,
             case when prev_t is null or t - prev_t > {gap}
                  then 1 else 0 end as new_session
      from ordered),
    sessions as (
      select user_id, event_id,
             sum(new_session) over (partition by user_id
                                    order by t, event_id
                                    rows unbounded preceding) as session_id
      from marked),
    per_session as (
      select user_id, session_id, count(*) as n
      from sessions group by 1, 2)
    select user_id, count(*) as n_sessions, sum(n)::BIGINT as n_events,
           max(n) as max_session_events
    from per_session group by user_id"""


def _float_order_key(v: np.ndarray) -> np.ndarray:
    """Order-preserving map float64 → uint64 (IEEE total order for
    finite values: flip the sign bit for positives, all bits for
    negatives)."""
    u = v.astype(np.float64).view(np.uint64)
    neg = u >> np.uint64(63) == 1
    out = np.where(neg, ~u, u | np.uint64(1 << 63))
    return out


def exact_value_quantiles(ds: Dataset,
                          ps: tuple[float, ...] = (0.5, 0.9, 0.99),
                          col: str = "value",
                          part_bits: int = 8) -> Dataset:
    """One row (n_events, p50, p90, p99) — exact ``percentile_disc``
    order statistics over an ARBITRARY float64 column, no bounded-domain
    assumption (cf. :func:`event_value_percentiles`, which histograms
    integer cents) and no sketch: the float bit pattern maps to an
    order-preserving uint64 whose high bits range-partition the value
    space; tiny per-partition counts prefix-sum on the driver to locate
    each target rank's owning partition and local rank; a second
    column-pruned pass sorts ONLY the owning partitions and picks the
    elements. Selected values are actual data elements, so the result is
    bit-exact vs SQL. Skewed value distributions only unbalance
    partition sizes, never correctness (the second pass sorts at most
    len(ps) partitions)."""
    import ray.data as rd

    def keyed(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        key = _float_order_key(v)
        return pa.table({
            col: batch[col],
            "part": pa.array((key >> np.uint64(64 - part_bits))
                             .astype(np.int32)),
        })

    keyed_ds = ds.select_columns([col]).map_batches(
        keyed, batch_format="pyarrow")
    counts = keyed_ds.groupby("part").count().take_all()  # ≤ 2^bits rows
    sizes = np.zeros(1 << part_bits, dtype=np.int64)
    for r in counts:
        sizes[r["part"]] = r["count()"]
    cum = np.cumsum(sizes)
    total = int(cum[-1])
    if total == 0:
        # SQL semantics on empty input: count 0, NULL percentiles (the
        # searchsorted below would otherwise index past the last
        # partition and die on a KeyError)
        out0 = {"n_events": pa.array([0], type=pa.int64())}
        for p in ps:
            out0[f"p{int(p * 100)}"] = pa.array([None], type=pa.float64())
        return rd.from_arrow(pa.table(out0))
    targets: dict[int, list[tuple[float, int]]] = {}
    for p in ps:
        rank = max(1, int(np.ceil(p * total)))  # percentile_disc
        part = int(np.searchsorted(cum, rank, side="left"))
        before = int(cum[part - 1]) if part else 0
        targets.setdefault(part, []).append((p, rank - before))

    def pick(group: pa.Table) -> pa.Table:
        part = group["part"][0].as_py()
        want = targets.get(part)
        if not want:
            return pa.table({"p": pa.array([], type=pa.float64()),
                             col: pa.array([], type=pa.float64())})
        v = np.sort(group[col].to_numpy(zero_copy_only=False))
        return pa.table({
            "p": pa.array([p for p, _ in want], type=pa.float64()),
            col: pa.array([float(v[r - 1]) for _, r in want]),
        })

    rows = (keyed_ds.groupby("part")
            .map_groups(pick, batch_format="pyarrow")
            .take_all())  # ≤ len(ps) rows
    by_p = {r["p"]: r[col] for r in rows}
    out = {"n_events": pa.array([total], type=pa.int64())}
    for p in ps:
        out[f"p{int(p * 100)}"] = pa.array([by_p[p]], type=pa.float64())
    return rd.from_arrow(pa.table(out))


FLOAT_QUANTILES_SQL = """
    select count(*) as n_events,
           percentile_disc(0.5) within group (order by value) as p50,
           percentile_disc(0.9) within group (order by value) as p90,
           percentile_disc(0.99) within group (order by value) as p99
    from events"""


def gap_filled_windows(ds: Dataset, window_sec: int = 3600,
                       num_parts: int = 64) -> Dataset:
    """(event_type, window_start, n_events, value_cents) for EVERY
    tumbling window between the stream's first and last event,
    zero-filled where a type had no events — time-series resampling
    with gap fill, the dense-grid input a monitoring/forecasting stage
    expects (sparse window aggregates silently skip empty periods).

    Distributed shape: the sparse per-(type, window) aggregate is the
    usual per-batch vectorized window computation + one groupby; the
    dense grid SYNTHESIZES distributed — ``ray.data.range`` over
    |types| × |windows| index space mapped to (type, window) rows, so
    a year of minute-windows across thousands of keys never
    materializes on the driver. Grid and sparse rows co-partition by
    a hash of (type, window) and zero-fill in one merge scan. Driver
    state: the type list and the [min, max] window bounds (one tiny
    aggregate over per-batch partial min/max rows).

    Exactness: counts and half-away cents are integers; window bounds
    are epoch-truncated under the non-negative-epoch contract — mirrors
    a ``generate_series`` cross-join left-join SQL oracle exactly."""
    import ray.data as rd

    win_us = 1_000_000 * window_sec

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        _check_epoch_nonneg(ts)
        win = pc.multiply(pc.divide(ts, win_us), win_us)
        return pa.table({
            "event_type": batch["event_type"],
            "w": win,
            "value_cents": _cents(batch["value"]),
        })

    windowed = ds.map_batches(add_window,
                              batch_format="pyarrow").materialize()

    def bounds_partial(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False)
        if len(w) == 0:
            return pa.table({"lo": pa.array([], type=pa.int64()),
                             "hi": pa.array([], type=pa.int64())})
        return pa.table({"lo": pa.array([int(w.min())], type=pa.int64()),
                         "hi": pa.array([int(w.max())], type=pa.int64())})

    brows = windowed.map_batches(bounds_partial,
                                 batch_format="pyarrow").take_all()
    if not brows:
        return rd.from_arrow(pa.table({
            "event_type": pa.array([], type=pa.string()),
            "window_start": pa.array([], type=pa.timestamp("us")),
            "n_events": pa.array([], type=pa.int64()),
            "value_cents": pa.array([], type=pa.int64()),
        }))
    lo = min(r["lo"] for r in brows)
    hi = max(r["hi"] for r in brows)
    n_windows = (hi - lo) // win_us + 1
    # the type enum: one tiny distinct aggregate (enum-bounded)
    types = sorted(r["event_type"] for r in
                   windowed.groupby("event_type").count().take_all())
    t_code = {t: i for i, t in enumerate(types)}

    sparse = (windowed.groupby(["event_type", "w"])
              .aggregate(Count(alias_name="n_events"),
                         Sum("value_cents", alias_name="value_cents")))

    def key_part(tcode: np.ndarray, w: np.ndarray) -> np.ndarray:
        k = tcode.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) \
            ^ w.astype(np.uint64)
        return (k % np.uint64(num_parts)).astype(np.int32)

    def sparse_rows(batch: pa.Table) -> pa.Table:
        tc = np.array([t_code[t] for t in
                       batch["event_type"].to_pylist()], dtype=np.int64)
        w = batch["w"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(key_part(tc, w)),
            "tcode": pa.array(tc),
            "w": batch["w"],
            "n_events": batch["n_events"],
            "value_cents": batch["value_cents"],
        })

    def grid_rows(batch) -> pa.Table:
        idx = batch["id"].to_numpy(zero_copy_only=False)
        tc = idx // n_windows
        w = lo + (idx % n_windows) * win_us
        z = np.zeros(len(idx), dtype=np.int64)
        return pa.table({
            "part": pa.array(key_part(tc, w)),
            "tcode": pa.array(tc.astype(np.int64)),
            "w": pa.array(w.astype(np.int64)),
            "n_events": pa.array(z),
            "value_cents": pa.array(z),
        })

    grid = rd.range(len(types) * int(n_windows)).map_batches(
        grid_rows, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        tc = group["tcode"].to_numpy(zero_copy_only=False)
        w = group["w"].to_numpy(zero_copy_only=False)
        n = group["n_events"].to_numpy(zero_copy_only=False)
        c = group["value_cents"].to_numpy(zero_copy_only=False)
        # a slot appears once (grid) or twice (grid + sparse); summing
        # per slot zero-fills and merges in one pass
        order = np.lexsort((w, tc))
        tc, w, n, c = tc[order], w[order], n[order], c[order]
        new = np.ones(len(tc), dtype=bool)
        new[1:] = (tc[1:] != tc[:-1]) | (w[1:] != w[:-1])
        seg = np.cumsum(new) - 1
        # int64 scatter-adds (bincount weights would round-trip through
        # float64 — exact only below 2^53 cents per slot)
        n_out = np.zeros(seg[-1] + 1, dtype=np.int64)
        np.add.at(n_out, seg, n)
        c_out = np.zeros(seg[-1] + 1, dtype=np.int64)
        np.add.at(c_out, seg, c)
        tnames = np.array(types, dtype=object)
        return pa.table({
            "event_type": pa.array(tnames[tc[new]], type=pa.string()),
            "window_start": pa.array(w[new]).cast(pa.timestamp("us")),
            "n_events": pa.array(n_out),
            "value_cents": pa.array(c_out),
        })

    return (sparse.map_batches(sparse_rows, batch_format="pyarrow")
            .union(grid)
            .groupby("part").map_groups(merge, batch_format="pyarrow")
            .sort(["event_type", "window_start"]))


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(ds: Dataset, steps: tuple[str, ...] = FUNNEL_STEPS,
                  num_parts: int | None = None) -> Dataset:
    """Funnel analysis — how many users reach each step of an ordered
    event chain: a user reaches step k if they have a step-k event
    STRICTLY after their earliest qualifying step-(k-1) event (earliest
    chaining, the standard strict-funnel semantics). Output one row per
    step: (step_idx, step, n_users), zero counts included.

    One coarse user-hash shuffle co-locates each user's events; the
    per-partition chain is fully vectorized — per-user minima via
    ``np.minimum.at`` scatter, then each later step filters its events
    to those after the user's previous-step time and scatters again.
    Partition outputs are per-step COUNT partials (≤ len(steps) rows per
    partition) merged by one tiny groupby; a constant zero-row seed
    keeps never-reached steps present in the result.
    """
    from .partitioning import auto_num_parts

    if num_parts is None:
        num_parts = auto_num_parts(ds)
    step_list = list(steps)

    def add_part(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"], value_set=pa.array(step_list))
        t = batch.filter(keep)
        ts = t["ts"].cast(pa.int64())
        _check_epoch_nonneg(ts)  # the prev = -1 chain sentinel needs it
        sidx = pc.index_in(t["event_type"],
                           value_set=pa.array(step_list)).cast(pa.int8())
        return pa.table({
            "part": pc.cast(pc.bit_wise_and(t["user_id"], num_parts - 1),
                            pa.int32()),
            "user_id": t["user_id"],
            "ts": ts,
            "sidx": sidx,
        })

    def chain(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        sidx = group["sidx"].to_numpy(zero_copy_only=False)
        uu, uc = np.unique(u, return_inverse=True)
        nu = len(uu)
        sentinel = np.iinfo(np.int64).max
        prev = np.full(nu, -1, dtype=np.int64)  # "before everything"
        counts = []
        for k in range(len(step_list)):
            cur = np.full(nu, sentinel, dtype=np.int64)
            m = (sidx == k) & (prev[uc] != sentinel) & (ts > prev[uc])
            np.minimum.at(cur, uc[m], ts[m])
            counts.append(int((cur != sentinel).sum()))
            prev = cur
        return pa.table({
            "step_idx": pa.array(np.arange(len(step_list),
                                           dtype=np.int64)),
            "step": pa.array(step_list, type=pa.string()),
            "n_users": pa.array(counts, type=pa.int64()),
        })

    seed = rd.from_arrow(pa.table({
        "step_idx": pa.array(np.arange(len(step_list), dtype=np.int64)),
        "step": pa.array(step_list, type=pa.string()),
        "n_users": pa.array([0] * len(step_list), type=pa.int64()),
    }))
    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(chain, batch_format="pyarrow")
            .union(seed)
            .groupby(["step_idx", "step"])
            .aggregate(Sum("n_users", alias_name="n_users")))


# note the step-0 chain condition degenerates to "has any step-0 event":
# prev = -1 < every ts
FUNNEL_SQL = """
    with u1 as (select user_id, min(ts) as t from events
                where event_type = 'view' group by 1),
    u2 as (select e.user_id, min(e.ts) as t from events e
           join u1 on e.user_id = u1.user_id and e.ts > u1.t
           where e.event_type = 'click' group by 1),
    u3 as (select e.user_id, min(e.ts) as t from events e
           join u2 on e.user_id = u2.user_id and e.ts > u2.t
           where e.event_type = 'purchase' group by 1)
    select 0::BIGINT as step_idx, 'view' as step,
           count(*)::BIGINT as n_users from u1
    union all
    select 1::BIGINT, 'click', count(*)::BIGINT from u2
    union all
    select 2::BIGINT, 'purchase', count(*)::BIGINT from u3"""


#: epoch seconds of 1970-01-05, the first Monday — week indexes below
#: are Monday-aligned like ISO weeks
WEEK_ANCHOR_SEC = 4 * 86400
WEEK_SEC = 7 * 86400


def cohort_retention(ds: Dataset,
                     num_parts: int | None = None) -> Dataset:
    """Cohort retention — users bucketed by their FIRST-EVER activity
    week (the cohort), counted in every later week they were active:
    (cohort_week, week_offset, n_users) with week_offset = active week −
    cohort week (0 = the cohort week itself). Weeks are Monday-aligned
    epoch-week indexes.

    One coarse user-hash shuffle co-locates each user's history, so the
    first-touch week and the distinct active weeks come from the same
    vectorized partition scan (per-user min via ``np.minimum.at``,
    distinct (user, week) via one packed-key ``np.unique``); partitions
    emit (cohort, offset, count) partials merged by a tiny groupby —
    shuffle volume is O(rows) once, then O(parts × distinct cells).
    """
    from .partitioning import auto_num_parts

    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def add_part(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        _check_epoch_nonneg(ts)
        sec = pc.divide(ts, 1_000_000)
        wk = pc.divide(pc.subtract(sec, WEEK_ANCHOR_SEC), WEEK_SEC)
        return pa.table({
            "part": pc.cast(pc.bit_wise_and(batch["user_id"],
                                            num_parts - 1), pa.int32()),
            "user_id": batch["user_id"],
            "wk": wk,
        })

    def per_part(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False)
        wk = group["wk"].to_numpy(zero_copy_only=False)
        uu, uc = np.unique(u, return_inverse=True)
        cohort = np.full(len(uu), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(cohort, uc, wk)
        # distinct (user, week) cells; week index fits easily in 32 bits
        packed = np.unique((uc.astype(np.int64) << 32) | wk)
        puc = packed >> 32
        pwk = packed & 0xFFFFFFFF
        cell = np.unique((cohort[puc] << 32) | (pwk - cohort[puc]),
                         return_counts=True)
        return pa.table({
            "cohort_week": pa.array(cell[0] >> 32, type=pa.int64()),
            "week_offset": pa.array(cell[0] & 0xFFFFFFFF,
                                    type=pa.int64()),
            "n_users": pa.array(cell[1].astype(np.int64)),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(per_part, batch_format="pyarrow")
            .groupby(["cohort_week", "week_offset"])
            .aggregate(Sum("n_users", alias_name="n_users")))


COHORT_SQL = f"""
    with w as (select user_id,
                      (floor(epoch(ts))::BIGINT - {WEEK_ANCHOR_SEC})
                          // {WEEK_SEC} as wk
               from events),
    f as (select user_id, min(wk) as cw from w group by 1),
    d as (select distinct w.user_id, f.cw, w.wk
          from w join f using (user_id))
    select cw as cohort_week, wk - cw as week_offset,
           count(*)::BIGINT as n_users
    from d group by 1, 2"""


def _scatter_max(codes: np.ndarray, vals: np.ndarray,
                 k: int) -> np.ndarray:
    """Per-code maxima of non-negative vals via one linear unbuffered
    scatter (the np.add.at idiom, max edition)."""
    acc = np.zeros(k, dtype=np.int64)
    np.maximum.at(acc, codes, vals)
    return acc


#: hour-zero for :func:`group_ols` — events before this raise (keeps x
#: non-negative so truncating and flooring division agree, and keeps
#: the integer sufficient statistics small)
OLS_EPOCH0 = "2024-01-01"
_OLS_EPOCH0_SEC = 1_704_067_200


def group_ols(ds: Dataset) -> Dataset:
    """Per-event-type ordinary least squares of value on time — the
    sufficient-statistics shape: y = integer cents, x = hour index since
    :data:`OLS_EPOCH0`; per batch one vectorized bincount pass emits the
    per-type partials (n, Σx, Σy, Σxy, Σx², Σy² — all exact int64), one
    tiny groupby merges them, and slope/intercept/Pearson-r are single
    float64 expressions over the exact integer moments, so the float
    columns themselves are value-exact vs the SQL oracle (numerator and
    denominators combined in arbitrary-precision Python ints, converted
    once, divided once — identical to the oracle's ::BIGINT::DOUBLE
    shapes).

    Overflow soundness: per-type Max(|x|)/Max(|y|) ride along and the
    final combine proves n·max² < 2^63 (a conservative bound on every
    moment), raising rather than silently wrapping — the documented
    scale path beyond ~10⁹ rows per group is a second pass with
    hi/lo-split moment columns.
    """

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist())
        types, codes = np.unique(et, return_inverse=True)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = (ts // 1_000_000 - _OLS_EPOCH0_SEC) // 3600
        if x.size and int(x.min()) < 0:
            raise ValueError(
                f"events before {OLS_EPOCH0} are outside group_ols's "
                "non-negative hour-index contract")
        y = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        if y.size and int(np.abs(y).max()) >= (1 << 21):
            raise ValueError(
                "value exceeds the 2^21-cent OLS contract (~$21k) — "
                "rescale before regressing")
        k = len(types)

        def bc(w):
            # np.bincount(weights=...) accumulates in float64 (2^53
            # exactness cliff on Σy² with big batches) — scatter-add on
            # an int64 accumulator keeps every moment exact
            acc = np.zeros(k, dtype=np.int64)
            np.add.at(acc, codes, w)
            return acc

        return pa.table({
            "event_type": pa.array(types.tolist(), type=pa.string()),
            "n": pa.array(np.bincount(codes, minlength=k)
                          .astype(np.int64)),
            "sx": pa.array(bc(x)), "sy": pa.array(bc(y)),
            "sxy": pa.array(bc(x * y)), "sxx": pa.array(bc(x * x)),
            "syy": pa.array(bc(y * y)),
            "max_ax": pa.array(_scatter_max(codes, np.abs(x), k)),
            "max_ay": pa.array(_scatter_max(codes, np.abs(y), k)),
        })

    moments = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("event_type")
               .aggregate(Sum("n", alias_name="n"),
                          Sum("sx", alias_name="sx"),
                          Sum("sy", alias_name="sy"),
                          Sum("sxy", alias_name="sxy"),
                          Sum("sxx", alias_name="sxx"),
                          Sum("syy", alias_name="syy"),
                          Max("max_ax", alias_name="max_ax"),
                          Max("max_ay", alias_name="max_ay")))

    def finish(batch: pa.Table) -> pa.Table:
        import math
        rows = batch.to_pylist()
        out = {"event_type": [], "n_events": [], "slope": [],
               "intercept": [], "r": []}
        for row in rows:
            n, sx, sy = int(row["n"]), int(row["sx"]), int(row["sy"])
            sxy, sxx, syy = (int(row["sxy"]), int(row["sxx"]),
                             int(row["syy"]))
            mx, my = int(row["max_ax"]), int(row["max_ay"])
            for bound in (n * mx * mx, n * mx * my, n * my * my):
                if bound >= (1 << 63):
                    raise ValueError(
                        "OLS moment bound n*max^2 exceeds int64 — "
                        "partial sums may have wrapped; split the "
                        "moments or rescale")
            num = n * sxy - sx * sy
            denx = n * sxx - sx * sx
            deny = n * syy - sy * sy
            if denx == 0 or deny == 0:
                raise ValueError(
                    f"degenerate OLS group {row['event_type']!r}: "
                    "constant x or y")
            if max(abs(num), denx, deny) >= (1 << 63):
                raise ValueError("OLS combined moment exceeds int64 — "
                                 "oracle-shape contract broken")
            slope = float(num) / float(denx)
            out["event_type"].append(row["event_type"])
            out["n_events"].append(n)
            out["slope"].append(slope)
            out["intercept"].append(
                (float(sy) - slope * float(sx)) / float(n))
            out["r"].append(float(num) / (math.sqrt(float(denx))
                                          * math.sqrt(float(deny))))
        return pa.table({
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "n_events": pa.array(out["n_events"], type=pa.int64()),
            "slope": pa.array(out["slope"], type=pa.float64()),
            "intercept": pa.array(out["intercept"], type=pa.float64()),
            "r": pa.array(out["r"], type=pa.float64()),
        })

    return moments.map_batches(finish, batch_format="pyarrow")


OLS_SQL = f"""
    with pts as (
      select event_type,
             (floor(epoch(ts))::BIGINT - {_OLS_EPOCH0_SEC}) // 3600 as x,
             cast(round(value * 100) as bigint) as y
      from events),
    s as (select event_type, count(*)::HUGEINT as n,
                 sum(x) as sx, sum(y) as sy, sum(x*y) as sxy,
                 sum(x*x) as sxx, sum(y*y) as syy
          from pts group by 1),
    t as (select event_type, n, sx, sy,
                 (n*sxy - sx*sy)::BIGINT as num,
                 (n*sxx - sx*sx)::BIGINT as denx,
                 (n*syy - sy*sy)::BIGINT as deny
          from s),
    u as (select *, (num::DOUBLE) / (denx::DOUBLE) as slope from t)
    select event_type, n::BIGINT as n_events, slope,
           (sy::BIGINT::DOUBLE - slope * sx::BIGINT::DOUBLE)
               / (n::BIGINT::DOUBLE) as intercept,
           (num::DOUBLE) / (sqrt(denx::DOUBLE) * sqrt(deny::DOUBLE)) as r
    from u"""


def zscore_normalize(ds: Dataset) -> Dataset:
    """Per-event-type z-score feature normalization — the standard ML
    preprocessing stage: (event_id, event_type, z) with
    ``z = (cents − mean) / sample_sd`` over exact integer cents.

    Two-pass broadcast-statistics shape: pass 1 computes per-type exact
    int64 moments (n, Σy, Σy² — the :func:`group_ols` partial-combine
    pattern) through one tiny groupby; the ≤ |types| (mean, sd) rows are
    computed driver-side with the oracle's exact float64 expression
    shapes and closure-captured into pass 2, a pure vectorized per-row
    map with NO shuffle. The float z column itself is value-exact vs the
    SQL oracle (identical ::DOUBLE conversion and operation order).
    Groups need n ≥ 2 and non-constant values (sample sd > 0) — anything
    else raises rather than emitting infinities.
    """

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist())
        types, codes = np.unique(et, return_inverse=True)
        y = _cents(batch["value"]).to_numpy(zero_copy_only=False)
        if y.size and int(np.abs(y).max()) >= (1 << 21):
            raise ValueError(
                "value exceeds the 2^21-cent z-score contract (~$21k) "
                "— rescale first")
        k = len(types)
        acc_y = np.zeros(k, dtype=np.int64)
        acc_yy = np.zeros(k, dtype=np.int64)
        np.add.at(acc_y, codes, y)
        np.add.at(acc_yy, codes, y * y)
        return pa.table({
            "event_type": pa.array(types.tolist(), type=pa.string()),
            "n": pa.array(np.bincount(codes, minlength=k)
                          .astype(np.int64)),
            "sy": pa.array(acc_y), "syy": pa.array(acc_yy),
            "max_ay": pa.array(_scatter_max(codes, np.abs(y), k)),
        })

    moments = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby("event_type")
               .aggregate(Sum("n", alias_name="n"),
                          Sum("sy", alias_name="sy"),
                          Sum("syy", alias_name="syy"),
                          Max("max_ay", alias_name="max_ay"))
               .take_all())  # ≤ |event types| rows
    stats = {}
    import math
    for row in moments:
        n, sy, syy = int(row["n"]), int(row["sy"]), int(row["syy"])
        if n < 2:
            raise ValueError(
                f"z-score group {row['event_type']!r} has n < 2")
        my = int(row["max_ay"])
        if n * my * my >= (1 << 63):
            # conservative-sound: Σy² ≤ n·max² — proves the int64
            # partials can never have wrapped (the group_ols proof)
            raise ValueError(
                "z-score moment bound n*max^2 exceeds int64 — partial "
                "sums may have wrapped; split the moments or rescale")
        var_num = n * syy - sy * sy
        if var_num == 0:
            raise ValueError(
                f"constant-valued z-score group {row['event_type']!r}")
        if var_num >= (1 << 63) or n * (n - 1) >= (1 << 63):
            raise ValueError("z-score moment exceeds int64 — "
                             "oracle-shape contract broken")
        mean = float(sy) / float(n)
        sd = math.sqrt(float(var_num) / float(n * (n - 1)))
        stats[row["event_type"]] = (mean, sd)

    type_list = sorted(stats)
    mean_v = np.array([stats[t][0] for t in type_list])
    sd_v = np.array([stats[t][1] for t in type_list])

    def transform(batch: pa.Table) -> pa.Table:
        y = _cents(batch["value"]).to_numpy(
            zero_copy_only=False).astype(np.float64)
        code = pc.index_in(batch["event_type"],
                           value_set=pa.array(type_list)).to_numpy(
                               zero_copy_only=False)
        return pa.table({
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "z": pa.array((y - mean_v[code]) / sd_v[code],
                          type=pa.float64()),
        })

    return ds.map_batches(transform, batch_format="pyarrow")


ZSCORE_SQL = """
    with pts as (
      select event_id, event_type,
             cast(round(value * 100) as bigint) as y
      from events),
    s as (select event_type, count(*)::HUGEINT as n,
                 sum(y) as sy, sum(y*y) as syy
          from pts group by 1),
    m as (select event_type,
                 (sy::BIGINT::DOUBLE) / (n::BIGINT::DOUBLE) as mean,
                 sqrt(((n*syy - sy*sy)::BIGINT::DOUBLE)
                      / ((n*(n-1))::BIGINT::DOUBLE)) as sd
          from s)
    select p.event_id, p.event_type,
           (p.y::DOUBLE - m.mean) / m.sd as z
    from pts p join m using (event_type)"""


def event_transitions(ds: Dataset,
                      num_parts: int | None = None) -> Dataset:
    """Markov flow analysis — per-user ordered event-type transitions
    counted corpus-wide: (prev_type, next_type, n) for every
    consecutive pair in each user's (ts, event_id) log. The LAG-window
    shape: one coarse user-hash shuffle, a vectorized per-partition
    sort + shift-compare (no per-user dispatch), per-partition pair
    COUNT partials, one tiny groupby merge — shuffle №2 is
    O(parts × |types|²), never O(rows)."""
    from .partitioning import auto_num_parts

    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def add_part(batch: pa.Table) -> pa.Table:
        return pa.table({
            "part": pc.cast(pc.bit_wise_and(batch["user_id"],
                                            num_parts - 1), pa.int32()),
            "user_id": batch["user_id"],
            "ts": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    def pairs(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(group["event_type"].to_pylist())
        types, codes = np.unique(et, return_inverse=True)
        order = np.lexsort((eid, ts, u))
        u, codes = u[order], codes[order]
        same = u[1:] == u[:-1]  # consecutive rows of the same user
        prev_c = codes[:-1][same]
        next_c = codes[1:][same]
        k = len(types)
        key, n = np.unique(prev_c * k + next_c, return_counts=True)
        return pa.table({
            "prev_type": pa.array(types[key // k].tolist(),
                                  type=pa.string()),
            "next_type": pa.array(types[key % k].tolist(),
                                  type=pa.string()),
            "n": pa.array(n.astype(np.int64)),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(pairs, batch_format="pyarrow")
            .groupby(["prev_type", "next_type"])
            .aggregate(Sum("n", alias_name="n")))


TRANSITIONS_SQL = """
    with ordered as (
      select user_id, event_type,
             lag(event_type) over (partition by user_id
                                   order by ts, event_id) as prev_type
      from events)
    select prev_type, event_type as next_type, count(*)::BIGINT as n
    from ordered where prev_type is not null
    group by 1, 2"""


def pivot_weekly_counts(ds: Dataset,
                        types: tuple[str, ...] | None = None) -> Dataset:
    """Cross-tab / PIVOT — one row per Monday-aligned week with a count
    COLUMN per event type (the warehouse pivot shape over an
    enum-bounded column set). ``types=None`` discovers the distinct
    event types with one tiny pre-pass (the column set must be bounded
    and known before the schema exists — discovery is O(|types|)).

    Per batch one packed-key unique emits (week, type) partials; a tiny
    groupby merges; the vectorized pivot runs over the ≤ weeks × types
    result — never a second pass over the raw rows."""
    if types is None:
        # enum-bounded discovery pass (column pruned to one column)
        types = tuple(sorted(
            ds.select_columns(["event_type"]).unique("event_type")))
    if not types:
        raise ValueError("pivot needs at least one event type")
    type_list = list(types)

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        _check_epoch_nonneg(ts)
        sec = ts.to_numpy(zero_copy_only=False) // 1_000_000
        rel = sec - WEEK_ANCHOR_SEC
        # TRUNCATING division like the oracle's DuckDB ``//`` — numpy
        # // floors and disagrees for the in-contract days before the
        # Monday anchor (1970-01-01..04)
        wk = np.where(rel >= 0, rel // WEEK_SEC, -((-rel) // WEEK_SEC))
        code = pc.index_in(batch["event_type"],
                           value_set=pa.array(type_list)).to_numpy(
                               zero_copy_only=False)
        known = code >= 0  # types outside the pivot set are dropped
        key, n = np.unique(wk[known] * len(type_list)
                           + code[known].astype(np.int64),
                           return_counts=True)
        return pa.table({
            "week": pa.array(key // len(type_list), type=pa.int64()),
            "code": pa.array(key % len(type_list), type=pa.int64()),
            "n": pa.array(n.astype(np.int64)),
        })

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["week", "code"])
              .aggregate(Sum("n", alias_name="n")))

    def pivot(group: pa.Table) -> pa.Table:
        wk = group["week"].to_numpy(zero_copy_only=False)
        code = group["code"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        weeks = np.unique(wk)
        mat = np.zeros((weeks.size, len(type_list)), dtype=np.int64)
        mat[np.searchsorted(weeks, wk), code] = n
        cols = {"week": pa.array(weeks, type=pa.int64())}
        for j, t in enumerate(type_list):
            cols[f"n_{t}"] = pa.array(mat[:, j])
        return pa.table(cols)

    # weeks × types is enum-bounded → one pivot task is the right size;
    # for an unbounded pivot key, hash-partition on week instead
    return merged.repartition(1).map_batches(
        pivot, batch_format="pyarrow", batch_size=None).sort("week")


PIVOT_WEEKLY_SQL = f"""
    with w as (select (floor(epoch(ts))::BIGINT - {WEEK_ANCHOR_SEC})
                          // {WEEK_SEC} as week,
                      event_type
               from events)
    select week,
           count(*) filter (event_type = 'click')::BIGINT as n_click,
           count(*) filter (event_type = 'error')::BIGINT as n_error,
           count(*) filter (event_type = 'purchase')::BIGINT
               as n_purchase,
           count(*) filter (event_type = 'signup')::BIGINT as n_signup,
           count(*) filter (event_type = 'view')::BIGINT as n_view
    from w group by week"""


def user_event_sequences(ds: Dataset,
                         num_parts: int | None = None) -> Dataset:
    """Ordered per-group string aggregation (the warehouse
    ``string_agg(... order by ...)`` shape): per user, the
    concatenation of each event type's FIRST letter in (ts, event_id)
    order — the canonical sequence-mining / clickstream-signature
    input. One coarse user-hash shuffle; per partition a vectorized
    sort + zero-copy ListArray construction over per-user offsets +
    one ``pc.binary_join`` — no per-user Python concatenation."""
    from .partitioning import auto_num_parts

    if num_parts is None:
        num_parts = auto_num_parts(ds)

    def add_part(batch: pa.Table) -> pa.Table:
        if batch["event_type"].null_count:
            # a null letter would propagate to a NULL seq through
            # binary_join while the SQL string_agg SKIPS nulls — out of
            # contract, raise rather than silently diverge
            raise ValueError(
                "null event_type is outside user_event_sequences' "
                "contract — filter or fill first")
        return pa.table({
            "part": pc.cast(pc.bit_wise_and(batch["user_id"],
                                            num_parts - 1), pa.int32()),
            "user_id": batch["user_id"],
            "ts": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"],
            "letter": pc.utf8_slice_codeunits(batch["event_type"], 0, 1),
        })

    def fold(group: pa.Table) -> pa.Table:
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u = u[order]
        letters = pc.take(group["letter"].combine_chunks(),
                          pa.array(order))
        new = np.ones(len(u), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        offsets = np.append(starts, len(u)).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets),
                                         letters)
        return pa.table({
            "user_id": pa.array(u[starts], type=pa.int64()),
            "seq": pc.binary_join(lists, ""),
        })

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("part").map_groups(fold, batch_format="pyarrow"))


EVENT_SEQ_SQL = """
    select user_id,
           string_agg(substr(event_type, 1, 1), ''
                      order by ts, event_id) as seq
    from events group by user_id"""
