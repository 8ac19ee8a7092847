"""Deterministic scale-up of /root/testdata/sf0.1 for r06 optimization work.

The driver's round-end bench may run at a larger, driver-generated scale
factor (BENCH_r05.json: sf=1.0).  That generator is driver-side; this script
builds an sf1-SHAPED stand-in by tiling sf0.1 with id offsets (×10 rows per
table, matching the sf0.1→sf1.0 row-count ratios observed in BENCH_r05:
events 100k→1M, documents ~×10, embeddings ~×10).  Content distributions are
preserved (texts repeat verbatim under new doc_ids; embeddings get a small
deterministic per-tile perturbation so cosine structure isn't fully
degenerate).  Used ONLY for before/after perf measurement and
Spark-vs-DuckDB twin checks at scale — never for driver-visible numbers.

Usage: python scripts/gen_scale_data.py [out_dir] [tiles]
Defaults: /tmp/sfbig 10
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def tile_table(name: str, id_cols: dict, out_dir: str, tiles: int,
               perturb_embedding: bool = False) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    n = t.num_rows
    parts = []
    for k in range(tiles):
        cols = {}
        for field in t.schema:
            col = t.column(field.name)
            if field.name in id_cols:
                off = id_cols[field.name] * k
                cols[field.name] = pa.compute.add(col, off)
            elif perturb_embedding and field.name == "embedding" and k > 0:
                arr = np.stack(col.to_pylist()).astype(np.float32)
                arr[:, k % arr.shape[1]] += np.float32(0.01 * ((k % 7) - 3))
                cols[field.name] = pa.array(list(arr), type=field.type)
            else:
                cols[field.name] = col
        parts.append(pa.table(cols, schema=t.schema))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out_dir}/{name}.parquet", row_group_size=1 << 20)
    print(f"{name}: {n} -> {big.num_rows}")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    tiles = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    tile_table("documents", {"doc_id": 5000}, out_dir, tiles)
    tile_table("embeddings", {"vec_id": 2000}, out_dir, tiles,
               perturb_embedding=True)
    tile_table("events", {"event_id": 100000}, out_dir, tiles)
    tile_table("orders", {"o_orderkey": 150000}, out_dir, tiles)
    tile_table("customer", {"c_custkey": 15000}, out_dir, tiles)
    tile_table("lineitem", {"l_orderkey": 150000}, out_dir, tiles)
    tile_table("part", {"p_partkey": 20000}, out_dir, tiles)
    tile_table("supplier", {"s_suppkey": 1000}, out_dir, tiles)
    for small in ("nation", "region"):
        t = pq.read_table(f"{SRC}/{small}.parquet")
        pq.write_table(t, f"{out_dir}/{small}.parquet")
        print(f"{small}: copied")


if __name__ == "__main__":
    main()
