#!/usr/bin/env python
"""Build a deterministic sf1.0-shaped REPLICA of /root/testdata/sf0.1 for
measurement only (the driver generates its own sf1.0; this exists so
OPTIMIZATION_r07.md's at-scale numbers are reproducible on a box that
only ships sf0.001/0.01/0.1).

Method, chosen per table so *timing-relevant* statistics scale like the
real generator's:

* documents — regenerated statistically (NOT replicated: exact 10x copies
  would plant 45k artificial jaccard-1.0 twins and distort every dedup
  query). Per-doc seeded RNG draws L ~ U{10..100} words from the corpus'
  own 31-word vocabulary and lang/source from the measured sf0.1
  marginals; this reproduces the tiny shared 5-gram vocabulary (the
  property that makes dedup_ngram_jaccard's candidate stream huge) and
  the document-frequency shape within a few percent.
* customer/orders/lineitem/part/events/embeddings — 10x key-shifted
  replication (copy k adds k*ceil(max_key+1) to every key column,
  consistently across tables), so every headline join keeps its per-key
  fan-out and only the row volume scales.
* nation/region/supplier — dimension tables, copied as-is.

Usage: python scripts/make_sf_replica.py [out_dir] [scale]
"""
from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb
import numpy as np

SRC = Path("/root/testdata/sf0.1")


def gen_documents(con: duckdb.DuckDBPyConnection, out: Path, scale: int) -> None:
    rows = con.sql(f"select text, lang from '{SRC}/documents.parquet'").fetchall()
    vocab = sorted({w for t, _ in rows for w in t.split(" ")})
    langs, counts = np.unique([l for _, l in rows], return_counts=True)
    lang_p = counts / counts.sum()
    n = len(rows) * scale
    rng = np.random.RandomState(20260822)
    lens = rng.randint(10, 101, size=n)
    lang_pick = langs[rng.choice(len(langs), size=n, p=lang_p)]
    varr = np.array(vocab)
    texts = [" ".join(varr[rng.randint(0, len(varr), size=l)]) for l in lens]
    con.execute("create or replace table _docs(doc_id bigint, text varchar, lang varchar, source varchar, n_chars bigint)")
    con.executemany(
        "insert into _docs values (?,?,?,?,?)",
        [(i, t, str(lang_pick[i]), f"src{i % 20}", len(t)) for i, t in enumerate(texts)],
    )
    con.sql(f"copy _docs to '{out}/documents.parquet' (format parquet)")


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf1.0")
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)
    con = duckdb.connect()

    for t in ("nation", "region", "supplier"):
        shutil.copy(SRC / f"{t}.parquet", out / f"{t}.parquet")

    keys = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "part": ["p_partkey"],
        "events": ["event_id", "user_id"],
        "embeddings": ["vec_id"],
    }
    # one consistent shift per key *family* (custkey shift identical in
    # customer and orders, etc.) so joins line up copy-by-copy
    fam_max: dict[str, int] = {}
    for t, ks in keys.items():
        cols = [r[0] for r in con.sql(f"describe select * from '{SRC}/{t}.parquet'").fetchall()]
        for k in ks:
            if k not in cols:
                raise SystemExit(f"{t}.{k} missing (schema drift?): {cols}")
            fam = k.split("_", 1)[1]
            m = con.sql(f"select max({k}) from '{SRC}/{t}.parquet'").fetchone()[0]
            fam_max[fam] = max(fam_max.get(fam, 0), int(m) + 1)
    for t, ks in keys.items():
        cols = [r[0] for r in con.sql(f"describe select * from '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"({c} + c.k * {fam_max[c.split('_', 1)[1]]}) as {c}" if c in ks else c
            for c in cols
        )
        con.sql(
            f"copy (select {sel} from '{SRC}/{t}.parquet', "
            f"(select unnest(range({scale})) k) c) to '{out}/{t}.parquet' (format parquet)"
        )

    gen_documents(con, out, scale)
    (out / "_DONE").touch()
    for t in list(keys) + ["documents"]:
        n = con.sql(f"select count(*) from '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
