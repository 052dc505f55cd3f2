"""The flagship pipeline: interleaved docs → the 11 address-view layers.

DAG (SURVEY.md §3.1, Ray lifecycle — no "passes", a dataset DAG):

    docs ─ parse (stateless map_batches, span-preserving)
     ├─ entrances layer                              (no shuffle)
     ├─ ways_geo = assemble_ways                     (shuffles J1: node id, way id)
     │    ├─ stateless way layers (wwa, wwpc, addrx, buildings[off])
     │    ├─ interpolation stage → layer rows + ip points
     │    └─ streets (replicated to padded-bbox cells)
     ├─ places index (small → broadcast)
     └─ addresses = node ∪ way-centroid ∪ ip points
          └─ match_stage (shuffle J2: cell id) → nwa / connection_line /
             nearest_points / nearest_roads+areas (A1 dedup on way_id)

Materialization points: ``ways_geo`` (consumed by four branches) and the
match/interpolation tagged unions (each split into multiple layers). At
cluster scale these become Parquet checkpoints (``workdir``-based) so a rerun
resumes past completed stages; in-memory materialization is used when no
``workdir`` is given (tests, small runs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import (
    LAYER_ADDRX_ON_NONCLOSED_WAY,
    LAYER_BUILDINGS,
    LAYER_CONNECTION_LINE,
    LAYER_ENTRANCES,
    LAYER_INTERPOLATION,
    LAYER_NEAREST_AREAS,
    LAYER_NEAREST_POINTS,
    LAYER_NEAREST_ROADS,
    LAYER_NODES_WITH_ADDRESSES,
    LAYER_WAYS_WITH_ADDRESSES,
    LAYER_WAYS_WITH_POSTAL_CODE,
)
from ..functions.wkt import lines_wkt_from_offsets, point_wkt, two_point_line_wkt
from ..ops import dedup_first, filter_notnull
from ..schemas import (
    CONNECTION_LINE_SCHEMA,
    NEAREST_AREAS_SCHEMA,
    NEAREST_POINTS_SCHEMA,
    NEAREST_ROADS_SCHEMA,
    NODES_WITH_ADDRESSES_SCHEMA,
)
from ..stages.assembly import assemble_ways
from ..stages.entrances import entrances_layer
from ..stages.interpolation import (
    collect_endpoint_tags,
    interpolation_stage,
)
from ..stages.match import (
    build_places_index,
    ip_addresses,
    match_stage,
    node_addresses,
    streets_from_ways_geo,
    way_addresses,
)
from ..stages.parse import parse_docs
from ..stages.way_layers import (
    addrx_on_nonclosed_way_layer,
    buildings_layer,
    ways_with_addresses_layer,
    ways_with_postal_code_layer,
)


def _nwa_from_match(match_ds):
    def f(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["__out"], 0))
        n = s.num_rows
        lon = s["lon"].to_numpy(zero_copy_only=False)
        lat = s["lat"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                s["node_id"].combine_chunks(),
                s["way_id"].combine_chunks(),
                s["ip_id"].combine_chunks(),
                s["is_ip"].combine_chunks(),
                s["street"].combine_chunks(),
                s["houseno"].combine_chunks(),
                s["postcode"].combine_chunks(),
                s["city"].combine_chunks(),
                s["country"].combine_chunks(),
                s["fulladdr"].combine_chunks(),
                s["place"].combine_chunks(),
                s["road_id"].combine_chunks(),
                s["nody_place_id"].combine_chunks(),
                s["wayy_place_id"].combine_chunks(),
                s["lastchange"].combine_chunks(),
                s["lon"].combine_chunks(),
                s["lat"].combine_chunks(),
                pa.array(["POINT"] * n, pa.string()),
                point_wkt(lon, lat),
            ],
            schema=NODES_WITH_ADDRESSES_SCHEMA,
        )

    return match_ds.map_batches(f, batch_format="pyarrow")


def _connection_lines_from_match(match_ds):
    def f(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["__out"], 1))
        wkt = two_point_line_wkt(
            s["lon"].to_numpy(zero_copy_only=False),
            s["lat"].to_numpy(zero_copy_only=False),
            s["lon2"].to_numpy(zero_copy_only=False),
            s["lat2"].to_numpy(zero_copy_only=False),
        )
        return pa.Table.from_arrays(
            [
                s["node_id"].combine_chunks(),
                s["way_id"].combine_chunks(),
                pa.array(["LINESTRING"] * s.num_rows, pa.string()),
                wkt,
            ],
            schema=CONNECTION_LINE_SCHEMA,
        )

    return match_ds.map_batches(f, batch_format="pyarrow")


def _nearest_points_from_match(match_ds):
    def f(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t["__out"], 2))
        lon = s["lon"].to_numpy(zero_copy_only=False)
        lat = s["lat"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                s["way_id"].combine_chunks(),
                s["lon"].combine_chunks(),
                s["lat"].combine_chunks(),
                pa.array(["POINT"] * s.num_rows, pa.string()),
                point_wkt(lon, lat),
            ],
            schema=NEAREST_POINTS_SCHEMA,
        )

    return match_ds.map_batches(f, batch_format="pyarrow")


def _nearest_ways_from_match(
    match_ds, *, num_parts: int, internals: dict | None = None,
    exchange: str = "direct", stage_cb=None,
):
    """__out=3 candidates → dedup by way_id (first in reference processing
    order, ST4) → (roads_ds, areas_ds)."""
    _CAND_COLS = [
        "way_id", "name", "lastchange", "is_area", "xs", "ys", "ord0", "ord1", "ord2", "ord3",
    ]

    def _pre_cands(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["__out"], 3)).select(_CAND_COLS)

    sch = match_ds.schema()
    sch = getattr(sch, "base_schema", sch)
    cand_schema = pa.schema([sch.field(c) for c in _CAND_COLS])

    def project(is_area: bool, schema, geom_type: str, polygon: bool):
        def f(t: pa.Table) -> pa.Table:
            s = t.filter(
                pc.equal(t["is_area"], is_area) if is_area else pc.equal(t["is_area"], False)
            )
            xs = s["xs"].combine_chunks() if isinstance(s["xs"], pa.ChunkedArray) else s["xs"]
            ys = s["ys"].combine_chunks() if isinstance(s["ys"], pa.ChunkedArray) else s["ys"]
            offs = np.asarray(xs.offsets) - xs.offsets[0].as_py()
            flat = np.column_stack(
                (
                    np.asarray(xs.flatten(), dtype=np.float64),
                    np.asarray(ys.flatten(), dtype=np.float64),
                )
            )
            wkt = lines_wkt_from_offsets(flat, offs, polygon=polygon)
            return pa.Table.from_arrays(
                [
                    s["way_id"].combine_chunks(),
                    s["name"].combine_chunks(),
                    s["lastchange"].combine_chunks(),
                    pa.array([geom_type] * s.num_rows, pa.string()),
                    wkt,
                ],
                schema=schema,
            )

        return f

    _project_roads = project(False, NEAREST_ROADS_SCHEMA, "LINESTRING", False)
    _project_areas = project(True, NEAREST_AREAS_SCHEMA, "POLYGON", True)
    # direct exchange + map-side fusion: the candidate projection runs inside
    # the split tasks over the materialized match blocks — no separate plan
    # execution, no sort barrier. Native mode applies the projection as a
    # streamed map_batches and runs the packed-groupby exchange instead
    # (backpressured; the high-partition-count path — see SCALE.md).
    if exchange == "direct":
        # take the reduce wave's raw refs: rd.from_arrow_refs barriers on a
        # metadata task per ref, so a consumer notified BEFORE the Dataset
        # view is built (stage_cb "dedup_launched") can chain raw tasks on
        # the refs and overlap the reduce wave — the bench's roads/areas
        # consume collapses into the dedup window instead of trailing it
        dedup_refs = dedup_first(
            match_ds, ["way_id"], ["ord0", "ord1", "ord2", "ord3"], num_parts,
            exchange="direct", pre=_pre_cands, schema=cand_schema,
            return_refs=True,
        )
        if stage_cb is not None:
            stage_cb(
                "dedup_launched",
                {
                    "refs": list(dedup_refs),
                    "projects": {
                        LAYER_NEAREST_ROADS: _project_roads,
                        LAYER_NEAREST_AREAS: _project_areas,
                    },
                },
            )
        import ray.data as rd

        deduped = rd.from_arrow_refs(list(dedup_refs))
    else:
        deduped = dedup_first(
            match_ds.map_batches(_pre_cands, batch_format="pyarrow"),
            ["way_id"], ["ord0", "ord1", "ord2", "ord3"], num_parts,
        ).materialize()
    if internals is not None:
        internals["deduped"] = deduped

    roads = deduped.map_batches(_project_roads, batch_format="pyarrow")
    areas = deduped.map_batches(_project_areas, batch_format="pyarrow")
    return roads, areas


def _stage_checkpoint(build, *, workdir: str | None, name: str, fingerprint: str | None):
    """Materialization point → optional parquet checkpoint.

    Without ``workdir``: in-memory materialize (tests, small runs). With
    ``workdir``: the stage lands as ``<workdir>/<name>/`` parquet with a
    fingerprint manifest; a rerun whose fingerprint matches READS the
    checkpoint instead of recomputing everything upstream — the north-rule
    resume point at stage granularity (per-partition lineage comes from the
    per-block parquet files themselves)."""
    import json as _json
    import os as _os

    import ray.data as rd

    if workdir is None:
        return build().materialize()
    if fingerprint is None:
        # None == None would match the stale manifest from a PREVIOUS input:
        # without a fingerprint the checkpoint is write-only (never reused)
        fingerprint = "<unfingerprinted>"
    path = _os.path.join(workdir, name)
    man = _os.path.join(path, "_ckpt.json")
    try:
        if fingerprint != "<unfingerprinted>" and _json.load(open(man)).get(
            "fingerprint"
        ) == fingerprint and any(
            f.endswith(".parquet") for f in _os.listdir(path)
        ):
            return rd.read_parquet(path)
    except (OSError, ValueError):
        pass
    import shutil as _shutil

    if _os.path.exists(path):
        _shutil.rmtree(path)  # stale / partial checkpoint
    ds = build()
    _os.makedirs(path, exist_ok=True)  # an empty stage writes no files
    ds.write_parquet(path)
    _json.dump({"fingerprint": fingerprint, "stage": name}, open(man, "w"))
    files = [f for f in _os.listdir(path) if f.endswith(".parquet")]
    if not files:
        return ds  # empty stage: parquet dir has no schema to read back
    return rd.read_parquet(path)


class _PhaseClock:
    """Driver-side wall-clock decomposition of the pipeline's serial spine.

    Each ``tick(name)`` records the time since the previous tick; the result
    lands in ``internals["phases"]`` so the scaling harness can attribute the
    fixed (F) term of T(p) = F + W/p phase by phase instead of guessing."""

    def __init__(self):
        import time as _time

        self._time = _time
        self._last = _time.perf_counter()
        self.phases: dict[str, float] = {}

    def tick(self, name: str):
        now = self._time.perf_counter()
        self.phases[name] = round(now - self._last, 3)
        self._last = now


def build_layers_with_internals(
    docs_ds,
    *,
    num_parts: int = 16,
    buildings_enabled: bool = False,
    hot_cell_threshold: int | None = None,
    workdir: str | None = None,
    fingerprint: str | None = None,
    side_input_mode: str = "broadcast",
    stage_cb=None,
    exchange: str = "direct",
):
    """Like ``build_layers`` but also returns the materialized intermediate
    datasets ({parsed, ways_geo, interp_out, matched, deduped}) so callers
    (the bench's fused count pass) can derive multiple statistics per source
    with ONE scan instead of one execution per layer. ``workdir`` turns the
    four materialization points into resumable parquet checkpoints (see
    ``_stage_checkpoint``)."""
    """docs Dataset → dict layer_name → Dataset (lazy where possible).

    ``parsed`` is materialized WITHOUT the wide ``spans`` column because four
    independent branches consume it (assembly, entrances, node addresses,
    places/endpoint side inputs); without pinning, Ray's lazy re-execution
    would re-read and re-parse the input once per branch, and pinning the
    nested spans payload costs more than it saves. Layer outputs reference
    ``doc_id``, so spans remain re-joinable; the span-sequence invariant is
    asserted on the full ``parse_docs`` output in tests. At cluster scale
    this becomes a Parquet checkpoint under ``workdir`` (resume point #1)."""
    clock = _PhaseClock()
    parsed = _stage_checkpoint(
        lambda: parse_docs(docs_ds).drop_columns(["spans"]),
        workdir=workdir, name="parsed", fingerprint=fingerprint,
    )
    clock.tick("parsed")

    layers: dict[str, object] = {}
    layers[LAYER_ENTRANCES] = entrances_layer(parsed)

    ways_geo = _stage_checkpoint(
        lambda: assemble_ways(parsed, num_parts=num_parts, exchange=exchange),
        workdir=workdir, name="ways_geo", fingerprint=fingerprint,
    )
    clock.tick("ways_geo")

    layers[LAYER_WAYS_WITH_ADDRESSES] = ways_with_addresses_layer(ways_geo)
    layers[LAYER_WAYS_WITH_POSTAL_CODE] = ways_with_postal_code_layer(ways_geo)
    layers[LAYER_ADDRX_ON_NONCLOSED_WAY] = addrx_on_nonclosed_way_layer(ways_geo)
    layers[LAYER_BUILDINGS] = buildings_layer(ways_geo, enabled=buildings_enabled)
    if stage_cb is not None:
        # these layers' full lineage (parsed / ways_geo) is materialized: a
        # consumer can execute them NOW, overlapped with the side-input +
        # interpolation + match phases below
        stage_cb(
            "ways_ready",
            {
                k: layers[k]
                for k in (
                    LAYER_ENTRANCES,
                    LAYER_WAYS_WITH_ADDRESSES,
                    LAYER_WAYS_WITH_POSTAL_CODE,
                    LAYER_ADDRX_ON_NONCLOSED_WAY,
                )
            },
        )

    from concurrent.futures import ThreadPoolExecutor

    from .side_inputs import collect_side_inputs

    # Street replication depends only on ways_geo, not on the side inputs or
    # the interpolation stage — execute it in a background thread so its
    # whole execution overlaps the side-input collection + interpolation
    # barrier on the serial spine (measured: hides the streets execution
    # entirely; concurrent Dataset executions are independent plans over the
    # materialized ways_geo). Likewise the node/way address branches (only
    # the ip-point branch depends on interpolation): pre-executing them here
    # fills the worker-idle window left by the driver-side side-input
    # reduction, so the match phase pays only the small ip projection.
    _pool = ThreadPoolExecutor(max_workers=2)
    streets_future = _pool.submit(
        lambda: streets_from_ways_geo(ways_geo).materialize()
    )
    base_addrs_future = _pool.submit(
        lambda: node_addresses(parsed).union(way_addresses(ways_geo)).materialize()
    )

    if side_input_mode == "distributed":
        # scale fallback (SURVEY J3/ST2): endpoint tags become two
        # hash-partitioned joins, places become a name-sharded index service
        # — no driver-collected broadcast structures at all
        from ..stages.interpolation import interpolation_stage_distributed
        from ..stages.match import build_places_shards

        places = build_places_shards(parsed, ways_geo, n_shards=max(4, num_parts // 4))
        clock.tick("side_inputs")
        interp_out = _stage_checkpoint(
            lambda: interpolation_stage_distributed(parsed, ways_geo, num_parts=num_parts),
            workdir=workdir, name="interp_out", fingerprint=fingerprint,
        )
    else:
        from .side_inputs import collect_side_inputs_async

        # refs, not values: both reductions run off-driver and overlap the
        # background street/address pre-executions
        endpoint_tags, places = collect_side_inputs_async(parsed, ways_geo)
        clock.tick("side_inputs")
        # fast path (no checkpoints, direct exchange, no salting): the
        # interpolation wave runs as raw tasks and its refs feed the match
        # exchange DIRECTLY (ops.RawRefs + map-side ip projection), so the
        # spine never waits on an interp materialize/metadata barrier and
        # never executes a union plan — interp compute overlaps the match
        # split wave on object availability (round-5 e2e fixed-term cut)
        fast = exchange == "direct" and workdir is None and hot_cell_threshold is None
        if fast:
            from ..stages.interpolation import interpolation_stage_raw

            interp_refs, interp_schema = interpolation_stage_raw(
                ways_geo, endpoint_tags
            )
            interp_out = None  # resolved into a Dataset off the spine below
        else:
            interp_out = _stage_checkpoint(
                lambda: interpolation_stage(ways_geo, endpoint_tags),
                workdir=workdir, name="interp_out", fingerprint=fingerprint,
            )
    clock.tick("interp_out")

    def _interp_layer_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["__out"], 0)).select(
            [
                "way_id", "typename", "firstid", "lastid", "firstno", "lastno",
                "error", "lastchange", "geom_type", "geom_wkt",
            ]
        )

    fast = side_input_mode == "broadcast" and interp_out is None
    if fast:
        import ray.data as rd

        from ..ops import RawRefs

        # rd.from_arrow_refs barriers on every ref — build the Dataset view
        # in a background thread; the spine keeps only the raw refs
        interp_ds_future = _pool.submit(
            lambda: rd.from_arrow_refs(list(interp_refs))
        )
        if stage_cb is not None:
            _pool.submit(
                lambda: stage_cb(
                    "interp_ready",
                    {
                        LAYER_INTERPOLATION: interp_ds_future.result().map_batches(
                            _interp_layer_filter, batch_format="pyarrow"
                        )
                    },
                )
            )
        streets = streets_future.result()
        base_addrs = base_addrs_future.result()
        matched = match_stage(
            streets, base_addrs, places, num_parts=num_parts,
            exchange="direct", ip_src=RawRefs(interp_refs, interp_schema),
        )
        # the match exchange's return barriered on its reduce wave, so the
        # interp Dataset future resolves instantly now
        interp_out = interp_ds_future.result()
        layers[LAYER_INTERPOLATION] = interp_out.map_batches(
            _interp_layer_filter, batch_format="pyarrow"
        )
        _pool.shutdown()
    else:
        layers[LAYER_INTERPOLATION] = interp_out.map_batches(
            _interp_layer_filter, batch_format="pyarrow"
        )
        if stage_cb is not None:
            # interp_out is materialized — the interpolation layer is
            # consumable concurrently with the address/match phase
            stage_cb(
                "interp_ready", {LAYER_INTERPOLATION: layers[LAYER_INTERPOLATION]}
            )
        ip_points = interp_out.map_batches(
            lambda t: t.filter(pc.equal(t["__out"], 1)).select(
                [
                    "kind", "obj_id", "lon", "lat", "street", "houseno", "postcode",
                    "city", "country", "fulladdr", "place", "lastchange",
                    "ord0", "ord1", "ord2", "ord3",
                ]
            ),
            batch_format="pyarrow",
        )

        streets = streets_future.result()
        addrs = base_addrs_future.result().union(ip_addresses(ip_points))
        _pool.shutdown()
        salt_map = None
        if hot_cell_threshold is not None:
            from ..stages.match import compute_salt_map

            salt_map = compute_salt_map(addrs, hot_threshold=hot_cell_threshold)
        matched = _stage_checkpoint(
            lambda: match_stage(
                streets, addrs, places, num_parts=num_parts, salt_map=salt_map,
                exchange=exchange,
            ),
            workdir=workdir, name="matched", fingerprint=fingerprint,
        )
    clock.tick("matched")

    layers[LAYER_NODES_WITH_ADDRESSES] = _nwa_from_match(matched)
    layers[LAYER_CONNECTION_LINE] = _connection_lines_from_match(matched)
    layers[LAYER_NEAREST_POINTS] = _nearest_points_from_match(matched)
    if stage_cb is not None:
        # matched is materialized — the three match-projection layers are
        # consumable concurrently with the written-ways dedup exchange
        stage_cb(
            "matched_ready",
            {
                k: layers[k]
                for k in (
                    LAYER_NODES_WITH_ADDRESSES,
                    LAYER_CONNECTION_LINE,
                    LAYER_NEAREST_POINTS,
                )
            },
        )
    internals: dict = {
        "parsed": parsed,
        "ways_geo": ways_geo,
        "interp_out": interp_out,
        "matched": matched,
    }
    roads, areas = _nearest_ways_from_match(
        matched, num_parts=num_parts, internals=internals, exchange=exchange,
        stage_cb=stage_cb,
    )
    clock.tick("dedup")
    internals["phases"] = clock.phases
    layers[LAYER_NEAREST_ROADS] = roads
    layers[LAYER_NEAREST_AREAS] = areas
    return layers, internals


def build_layers(
    docs_ds,
    *,
    num_parts: int = 16,
    buildings_enabled: bool = False,
    hot_cell_threshold: int | None = None,
    workdir: str | None = None,
    fingerprint: str | None = None,
    side_input_mode: str = "broadcast",
    exchange: str = "direct",
):
    layers, _ = build_layers_with_internals(
        docs_ds,
        num_parts=num_parts,
        buildings_enabled=buildings_enabled,
        hot_cell_threshold=hot_cell_threshold,
        workdir=workdir,
        fingerprint=fingerprint,
        side_input_mode=side_input_mode,
        exchange=exchange,
    )
    return layers


def write_layers(layers: dict, outdir: str):
    """One parquet directory per layer (resumable layout: per-block files)."""
    import os

    for name, ds in layers.items():
        ds.write_parquet(os.path.join(outdir, name))
