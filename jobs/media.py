"""Media pipeline job — decode/feature/resize/frame-sample the media
spans of a docs table.

Usage:
    spark-submit --py-files dist_osm_lib_spark.zip jobs/media.py \
        --docs fixtures/sf-xs/docs.parquet \
        --out /tmp/media_out --stages catalog,features,resize,frames

Runs the requested stages of the multimodal pipeline (all of them by
default) over every media span: catalog (pure-Column ref parse),
features (REAL content-sniffed PNG/WAV/APNG decode), resize
(fixed-size tensor normalization; --width/--height), and frames (the
1→N sample fan-out, --every-n). Each stage lands as parquet under
<out>/<stage>/ and the one-line JSON summary on stdout reports row
counts per stage. `--kind img|audio|vid` restricts the frames stage
the way a video-only sampler would.

Every stage is map-only (no shuffle anywhere in the pipeline), so the
job scales with input splits alone — the 100 TB shape is the same DAG
with more partitions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_lib_spark.operators.multimodal import (  # noqa: E402
    decode_media_features,
    media_catalog,
    resize_media,
    sample_frames,
)
from osm_lib_spark.session import get_spark  # noqa: E402

STAGES = ("catalog", "features", "resize", "frames")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="path to docs parquet")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument(
        "--stages",
        default=",".join(STAGES),
        help=f"comma list from {STAGES} (default: all)",
    )
    ap.add_argument("--width", type=int, default=224)
    ap.add_argument("--height", type=int, default=224)
    ap.add_argument("--every-n", type=int, default=5)
    ap.add_argument(
        "--kind",
        default=None,
        help="restrict the frames stage to one media kind (img|audio|vid)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    bad = [s for s in stages if s not in STAGES]
    if bad or not stages:
        print(f"error: unknown stages {bad or args.stages!r}", file=sys.stderr)
        return 2
    if args.every_n < 1 or args.width < 1 or args.height < 1:
        print("error: --every-n/--width/--height must be >= 1", file=sys.stderr)
        return 2

    spark = get_spark("media_job", master=args.master)
    t0 = time.time()
    docs = spark.read.parquet(args.docs)
    counts: dict[str, int] = {}
    for stage in stages:
        if stage == "catalog":
            df = media_catalog(docs)
        elif stage == "features":
            df = decode_media_features(docs)
        elif stage == "resize":
            df = resize_media(docs, width=args.width, height=args.height)
        else:
            df = sample_frames(docs, every_n=args.every_n, media_kind=args.kind)
        dest = os.path.join(args.out, stage)
        df.write.mode("overwrite").parquet(dest)
        counts[stage] = spark.read.parquet(dest).count()
    print(
        json.dumps(
            {
                "out": args.out,
                "rows": counts,
                "elapsed_sec": round(time.time() - t0, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
