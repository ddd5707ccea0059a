"""spark-submit entry point proving the library ships as a --py-files zip
(north-rule deployment mode: ``spark-submit --py-files sketchlib.zip``).

Build the zip with::

    python tools/make_zip.py            # -> dist/sketchlib.zip

Run with::

    spark-submit --master 'local[8]' \
        --py-files dist/sketchlib.zip tools/submit_demo.py <table.parquet>

Prints one JSON line with the build result. Imports sketchlib ONLY from the
shipped zip (the repo dir is not on sys.path when launched from elsewhere).
"""

import json
import math
import sys

from pyspark.sql import SparkSession

from sketchlib.countmin import CMConfig
from sketchlib.spark_build import build_sketch

def main(path: str) -> None:
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CMConfig(eps=1e-4, delta=math.exp(-3), seed=1337)
    res = build_sketch(spark.read.parquet(path), "tokens", cfg)
    print(json.dumps({
        "n_rows": res.n_rows,
        "n_tokens": res.sketch.n_items,
        "sketch_sha16": __import__("hashlib").sha256(
            res.sketch.to_bytes()).hexdigest()[:16],
        "partitions": len(res.lineage),
    }))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1])
