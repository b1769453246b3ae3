#!/usr/bin/env python3
"""Dev-side generator for the dedup scale probe (NOT part of the shipped
library): blows the documents fixture up KX (default 10x) with
deterministic near-dup variants, preserving the block-size structure the
Sigma-|block|^2 contract is priced on.

Each source doc yields K variants: variant 0 is the original; variant k
perturbs every (k+1)-th token by suffixing it with "~k" and appends a
2-token tail. Variants of one doc stay near-dups of each other (most
shingles shared), docs that were unrelated stay unrelated — so MinHash
band blocks grow ~Kx and candidate pairs grow ~K^2 x per block, which is
exactly the knob the probe needs: wall-time should track pairs-per-block,
not corpus size.

Usage: python3 tools/scale_probe_gen.py <src_sf_dir> <dest_dir> [K]
Writes dest_dir/documents.parquet; doc_id' = doc_id * K + k (unique).
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq


def variant(text: str, k: int) -> str:
    if k == 0:
        return text
    toks = text.split(" ")
    step = k + 1
    toks = [t + "~" + str(k) if i % step == 0 else t
            for i, t in enumerate(toks)]
    return " ".join(toks) + f" vtail{k} probe{k}"


def main(src: str, dest: str, k: int) -> None:
    t = pq.read_table(f"{src}/documents.parquet")
    cols = {name: t.column(name).to_pylist() for name in t.column_names}
    n = t.num_rows
    out = {name: [] for name in t.column_names}
    for i in range(n):
        for v in range(k):
            for name in t.column_names:
                if name == "doc_id":
                    out[name].append(cols[name][i] * k + v)
                elif name == "text":
                    out[name].append(variant(cols[name][i], v))
                elif name == "n_chars":
                    out[name].append(len(variant(cols["text"][i], v)))
                else:
                    out[name].append(cols[name][i])
    schema = t.schema
    table = pa.table({name: pa.array(out[name], type=schema.field(name).type)
                      for name in t.column_names})
    import os
    os.makedirs(dest, exist_ok=True)
    pq.write_table(table, f"{dest}/documents.parquet")
    print(f"wrote {table.num_rows} rows ({n} x {k}) to {dest}/documents.parquet")


if __name__ == "__main__":
    src, dest = sys.argv[1], sys.argv[2]
    kk = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dest, kk)
