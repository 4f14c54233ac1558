#!/usr/bin/env python3
"""Builder-local 10x scale-probe data generator (NOT part of the
library — dev tooling only; VERDICT r11 #4).

Replicates the sf0.1 tables REP times with id-space offsets so the
workload grows ~linearly in every organic dimension:

- events:      user/session spaces shift per replica -> per-user
               structure identical, total volume x REP.
- documents:   text is Caesar-rotated per replica -> shingle/minhash/
               simhash spaces are disjoint across replicas (no planted
               cross-replica near-dups), length/token shape identical.
- embeddings:  vec ids shift; one dimension gets a tiny per-replica
               deterministic offset so replicas are not exact dups.
- lineitem:    order-key space shifts, part/supplier keys KEPT (brand
               grain unchanged, baskets x REP).
- orders/part/supplier/customer/nation/region: copied (dims) or
               order-shifted to stay referentially intact.

Round 14 (VERDICT r13 #3): `--sparse` also offsets the part /
supplier / customer key spaces per replica (replicating those dims
with matching shifted keys, so referential integrity holds). The
default mode repeats part pairs REP times, which DENSIFIES the
co-purchase support graph ~10^5x (every pair re-passes the c>=2
support threshold) and freezes the customer-supplier graph's node
set; sparse mode keeps pair sparsity, so graph edges grow ~REP x —
the honest scaling story for the graph family. Brand/name strings
are untouched (brand-grain dictionaries stay 25 brands — more parts
per brand, as organic growth would).

Usage: python3 tools/scale_probe_gen.py <outDir> [REP] [--sparse]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1]
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SPARSE = "--sparse" in sys.argv

import os
os.makedirs(OUT, exist_ok=True)


def read(t):
    return pq.read_table(f"{SRC}/{t}.parquet")


def caesar(text_arr, shift):
    # rotate a-z / A-Z by `shift` — disjoint shingle space per replica,
    # identical length and whitespace structure
    if shift == 0:
        return text_arr
    import string
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    tab = str.maketrans(
        lower + upper,
        lower[shift:] + lower[:shift] + upper[shift:] + upper[:shift])
    return pa.array([None if v is None else v.translate(tab)
                     for v in text_arr.to_pylist()], type=pa.string())


def shifted_concat(tbl, mutate):
    parts = [mutate(tbl, i) for i in range(REP)]
    return pa.concat_tables(parts)


def write(name, tbl):
    pq.write_table(tbl, f"{OUT}/{name}.parquet")
    print(name, tbl.num_rows)


ev = read("events")
max_user = pc.max(ev["user_id"]).as_py() + 1
max_eid = pc.max(ev["event_id"]).as_py() + 1


def mut_events(t, i):
    return t.set_column(0, "event_id", pc.add(t["event_id"], i * max_eid)) \
            .set_column(2, "user_id", pc.add(t["user_id"], i * max_user))


write("events", shifted_concat(ev, mut_events))

docs = read("documents")
max_doc = pc.max(docs["doc_id"]).as_py() + 1


def mut_docs(t, i):
    t = t.set_column(0, "doc_id", pc.add(t["doc_id"], i * max_doc))
    return t.set_column(1, "text", caesar(t["text"], i % 25))


write("documents", shifted_concat(docs, mut_docs))

emb = read("embeddings")
max_vec = pc.max(emb["vec_id"]).as_py() + 1


def mut_emb(t, i):
    t = t.set_column(0, "vec_id", pc.add(t["vec_id"], i * max_vec))
    if i == 0:
        return t
    vecs = t["embedding"].to_pylist()
    if SPARSE:
        # circular-shift each vector by i dims: norms and WITHIN-replica
        # cosine structure are preserved exactly (every pair shifts
        # together), but replicas leave the originals' neighborhoods —
        # near-dup GROUPS grow linearly with REP instead of every group
        # becoming a REP-times-larger clique (candidate pairs grew
        # ~REP^2 under the nudge mode; see SCALE_PROBE_r14.md).
        vecs = [v[i % len(v):] + v[:i % len(v)] for v in vecs]
    else:
        # nudge dim 0 by i * 1e-4 — replicas stop being exact duplicates
        # but stay in the same cosine neighborhoods (planted-duplicate
        # growth: the adversarial near-dup-density lens)
        for v in vecs:
            v[0] = v[0] + i * 1e-4
    return t.set_column(1, "embedding",
                        pa.array(vecs, type=pa.list_(pa.float32())))


write("embeddings", shifted_concat(emb, mut_emb))

li = read("lineitem")
orders = read("orders")
part = read("part")
supplier = read("supplier")
customer = read("customer")
max_ord = pc.max(orders["o_orderkey"]).as_py() + 1
max_part = pc.max(part["p_partkey"]).as_py() + 1
max_supp = pc.max(supplier["s_suppkey"]).as_py() + 1
max_cust = pc.max(customer["c_custkey"]).as_py() + 1


def shift_col(t, name, step, i):
    j = t.schema.get_field_index(name)
    return t.set_column(j, name, pc.add(t[name], i * step))


def mut_li(t, i):
    t = shift_col(t, "l_orderkey", max_ord, i)
    if SPARSE:
        t = shift_col(t, "l_partkey", max_part, i)
        t = shift_col(t, "l_suppkey", max_supp, i)
    return t


def mut_orders(t, i):
    t = shift_col(t, "o_orderkey", max_ord, i)
    if SPARSE:
        t = shift_col(t, "o_custkey", max_cust, i)
    return t


write("lineitem", shifted_concat(li, mut_li))
write("orders", shifted_concat(orders, mut_orders))

if SPARSE:
    write("part", shifted_concat(part, lambda t, i: shift_col(t, "p_partkey", max_part, i)))
    write("supplier", shifted_concat(supplier, lambda t, i: shift_col(t, "s_suppkey", max_supp, i)))
    write("customer", shifted_concat(customer, lambda t, i: shift_col(t, "c_custkey", max_cust, i)))
else:
    for dim in ["part", "supplier", "customer"]:
        write(dim, read(dim))
for dim in ["nation", "region"]:
    write(dim, read(dim))
