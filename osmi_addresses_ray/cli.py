"""CLI: run the address-view pipeline over a docs parquet table or OSM XML.

    python -m osmi_addresses_ray.cli INPUT OUTDIR [--resume]
        [--num-parts N] [--num-cpus N] [--buildings] [--sqlite OUT.sqlite]

INPUT is a docs parquet file/dir (doc_id, spans), or — matching the
reference's ``osmi-addresses INFILE [OUTDIR]`` entry point (main.cpp:33-57)
— a ``.osm``/``.osm.gz``/``.osm.bz2``/``.osm.pbf``/``.o5m``/``.opl[.gz|.bz2]``
extract, ingested via the distributed byte-range readers (sources/). The eleven layers land as parquet
directories under OUTDIR with per-layer manifests and a ``_metrics.json``
stats dump; ``--sqlite`` additionally exports a SpatiaLite-compatible
database (tools/export_sqlite.py). On a real cluster the identical script is
the ``ray job submit`` payload (only ``ray.init`` address changes).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="docs parquet file/dir (doc_id, spans)")
    p.add_argument("outdir")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-parts", type=int, default=32)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--buildings", action="store_true", help="enable the disabled buildings layer")
    p.add_argument("--sqlite", help="also export a SpatiaLite-compatible .sqlite file")
    p.add_argument(
        "--workdir",
        help="stage-checkpoint directory: parsed/ways_geo/interp/match land as "
        "resumable parquet; a rerun with the same inputs resumes mid-pipeline",
    )
    args = p.parse_args(argv)

    from .io import guard_output_dir, stage_fingerprint, write_layer

    guard_output_dir(args.outdir, resume=args.resume)
    if args.sqlite and os.path.exists(args.sqlite) and not args.resume:
        # fail BEFORE the (long) pipeline run, not after; on --resume the
        # previous export is ours to refresh — but only ATOMICALLY after the
        # pipeline succeeds (export to tmp, os.replace into place below), so
        # a mid-run failure never destroys the prior good database
        raise FileExistsError(f"{args.sqlite} exists (rerun with --resume to refresh)")

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from .pipelines.address_view import build_layers

    t0 = time.perf_counter()
    fp = stage_fingerprint(
        input=args.input, num_parts=args.num_parts, buildings=args.buildings, v=1
    )
    from .constants import ALL_LAYERS

    def _done(name: str) -> bool:
        mp = os.path.join(args.outdir, name, "_manifest.json")
        try:
            return json.load(open(mp)).get("fingerprint") == fp
        except (OSError, json.JSONDecodeError):
            return False

    if args.resume and all(_done(n) for n in ALL_LAYERS):
        print("all layers current; nothing to do", file=sys.stderr)
        ray.shutdown()
        return 0

    if args.input.endswith((".osm", ".osm.gz", ".osm.bz2")):
        from .sources.osm_xml import read_osm_xml

        docs = read_osm_xml(args.input)
    elif args.input.endswith(".osm.pbf"):
        from .sources.osm_pbf import read_osm_pbf

        docs = read_osm_pbf(args.input)
    elif args.input.endswith(".o5m"):
        from .sources.osm_o5m import read_osm_o5m

        docs = read_osm_o5m(args.input)
    elif args.input.endswith((".opl", ".opl.gz", ".opl.bz2")):
        from .sources.osm_opl import read_osm_opl

        docs = read_osm_opl(args.input)
    elif args.input.endswith(".lance"):
        # the north-star carrier, behind an explicit capability check (the
        # sandbox image lacks pylance; fail fast with an actionable error)
        from .sources.docs_io import read_lance_docs

        docs = read_lance_docs(args.input)
    else:
        docs = rd.read_parquet(args.input)
    layers = build_layers(
        docs,
        num_parts=args.num_parts,
        buildings_enabled=args.buildings,
        workdir=args.workdir,
        fingerprint=fp,
    )
    metrics = {"layers": {}, "wall_sec": None}
    for name, ds in layers.items():
        m = write_layer(ds, args.outdir, name, fp)
        metrics["layers"][name] = m
        print(f"{name}: {m['rows']} rows ({m['wall_ms']} ms)", file=sys.stderr)
    metrics["wall_sec"] = round(time.perf_counter() - t0, 2)
    json.dump(metrics, open(os.path.join(args.outdir, "_metrics.json"), "w"), indent=1)
    if args.sqlite:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from tools.export_sqlite import export

        tmp_sqlite = f"{args.sqlite}.tmp.{os.getpid()}"
        try:
            counts = export(args.outdir, tmp_sqlite)
            os.replace(tmp_sqlite, args.sqlite)
        finally:
            if os.path.exists(tmp_sqlite):
                os.remove(tmp_sqlite)
        print(f"sqlite export: {sum(counts.values())} rows → {args.sqlite}", file=sys.stderr)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
