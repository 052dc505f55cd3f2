"""Ad-hoc query runner: ``python -m osmi_addresses_ray.query_cli <name>
[sf_dir] [--out DIR] [--list]``.

Exposes every driver-contract query (the engine's full operator surface —
relational, time-series, dedup/ANN, sketches, text, multimodal, geospatial)
as a command-line entry point, so a user can run any pipeline without
writing Python. Results print as a head sample; ``--out`` writes the full
result as parquet (small results single-file, Datasets sharded).

Owns its Ray session (the driver contract forbids ``__ray_entry__`` itself
from calling ray.init, so the session lives here).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("name", nargs="?", help="query name (see --list)")
    p.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    p.add_argument("--out", help="write the full result as parquet here")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--list", action="store_true", help="list query names and exit")
    args = p.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    q = entry.queries()
    if args.list or not args.name:
        for name in sorted(q):
            print(name)
        return 0
    if args.name not in q:
        p.error(f"unknown query {args.name!r} (use --list)")

    import ray

    # only tear down a session WE created (running under pytest or a larger
    # driver, the ambient session must survive this call)
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    try:
        res = q[args.name](args.sf_dir)
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd

        if isinstance(res, rd.Dataset):
            if args.out:
                # materialize once: the write and the preview must not each
                # re-execute the whole lazy pipeline
                res = res.materialize()
                res.write_parquet(args.out)
                print(f"wrote Dataset to {args.out}", file=sys.stderr)
            res = res.limit(20).to_pandas()
            print(res.to_string())
        else:
            if isinstance(res, pa.Table):
                res = res.to_pandas()
            if args.out:
                os.makedirs(args.out, exist_ok=True)
                res.to_parquet(os.path.join(args.out, f"{args.name}.parquet"), index=False)
                print(f"wrote {len(res)} rows to {args.out}", file=sys.stderr)
            print(res.head(20).to_string())
            if len(res) > 20:
                print(f"... ({len(res)} rows total)")
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
