"""Synthesize a larger scale-factor directory from a driver-generated one
(round-6 verdict task 1: demonstrate the 100x-scale claims above sf0.1).

TESTDATA.md forbids modifying /root/testdata, not deriving from it: the
source is read-only input and the scaled copy lands elsewhere (/tmp by
default). Replication rules:

- region/nation: copied verbatim — fixed dimensions whose keys are
  referenced by nationkey/regionkey columns that are NOT offset, so every
  replica joins to the same 25/5 rows (exactly how a real warehouse scales:
  facts grow, enum-like dims don't).
- every other table: replica r adds r * stride to its primary key and to
  the foreign keys into OTHER replicated tables, where stride = max(key)+1
  of the source — so each replica is a self-consistent copy of the star
  schema (joins match within a replica, never across) and key-derived
  slices (doc_id % 7, vec_id < 8, user_id % buckets) keep their density.

Two modes for the VALUE columns (round-7 verdict task 4):

- ``replicate`` — values unchanged: per-day volumes, per-user series,
  token statistics and embedding geometry all scale by exactly N. Every
  document/vector becomes an exact N-plicate — pathological duplicate
  structure that stress-tests the dedup family's hot buckets but cannot
  separate inherent pair-output growth from plan debt.
- ``organic`` — replica 0 stays verbatim (the source SF embeds in the
  scaled frame); replicas r ≥ 1 keep ~10% of documents/vectors as exact
  copies (a realistic cross-crawl duplication rate) and deterministically
  perturb the rest: every ~7th token of a document is replaced by a
  replica-specific token (new vocabulary, Jaccard-near-dup rather than
  exact-dup clusters), and every embedding component gets hash-derived
  ±0.01 noise (cosine-near-dup vectors). Dup-cluster diversity, vocab
  and key cardinality now GROW with N, so a 10× sweep measures organic
  10× data instead of 10-plicate data. Relational fact values stay
  replicated in both modes — their operators key on ids/dates/amounts,
  not content similarity, and exact N× volume is the property the scale
  audit wants there.

Usage: python scripts/gen_scaled_testdata.py [src_sf_dir] [dst_dir] [N] [mode]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10 replicate
"""

from __future__ import annotations

import os
import sys

import duckdb

# table -> {column: stride_source_table} for key columns to offset;
# stride_source_table names whose primary-key max defines the stride.
OFFSETS: dict[str, dict[str, tuple[str, str]]] = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
VERBATIM = ("region", "nation")


_GROUP_SIZE = 10  # replicas per "crawl group" — bounds near-dup cliques


def _organic_text(r: int, n_groups: int) -> str:
    """Deterministic per-replica text perturbation, v3 (r9).

    v1 replaced every ~7th token per replica, which left ~63% of token
    3-windows VERBATIM across every replica pair — so at N=100 every
    source doc sat at the center of an ~89-member near-dup clique, and
    any pair-enumerating dedup query had inherently quadratic-in-N
    output (the r8 sf10 sweep measured 15B candidate pair rows / a 75 GB
    shuffle spill on dedup_ngram_jaccard — replicate-mode pathology, not
    organic growth). Real crawls grow mostly by NEW near-dup clusters,
    not by inflating every cluster linearly with corpus size.

    v2 bounded cliques with replica "crawl groups" of {_GROUP_SIZE} but
    designated each doc's verbatim groups independently per group
    (hash(doc*7+g) % 10 = 0), so verbatim cliques were ≈ n_groups/10 ×
    {_GROUP_SIZE} ≈ N/10 — linear in N, coinciding with the group size
    only at N=100 (the r8 maximum). v3 (r9, advisor finding) designates
    exactly ONE verbatim group per doc:

    - exact copies: a doc's verbatim replicas all come from the single
      group g == abs(hash(doc*7)) % max(n_groups, {_GROUP_SIZE}) —
      cliques are ≤ {_GROUP_SIZE}+1 (group + source replica 0) at ANY
      N. Drawing from at least {_GROUP_SIZE} slots keeps small-N frames
      non-degenerate (at N=10 there is one group; without the floor
      every doc's every replica went verbatim). Corpus-wide verbatim
      rate is ~min(10%, {_GROUP_SIZE}/N): 10% at N≤100, shrinking
      thereafter — real crawls grow by NEW clusters, not by inflating
      every cluster linearly with crawl size.
    - every perturbed doc gets a GROUP MARKER token at every 3rd
      position ('g<g>x' + token hash, deterministic per group), so every
      token 3-window differs across groups — zero cross-group (or
      perturbed-vs-verbatim) shingle overlap, hence near-dup cliques
      are bounded by the group size at ANY N.
    - within a group, ~1/3 of replicas are LIGHT near-dups (every ~7th
      token replaced per replica, as v1); the rest are HEAVY (every ~2nd
      token also replaced) and mutually dissimilar — so near-dup
      detection still has real work (bounded ~3-cliques per group plus
      the verbatim clusters), while vocabulary and cluster DIVERSITY
      keep growing with N.
    """
    g = r // _GROUP_SIZE
    heavy = f"hash(doc_id * 13 + {r}) % 3 != 0"
    tok_case = (
        f"CASE WHEN {heavy}"
        f" AND hash(doc_id * 1000003 + i * 31 + {r * 7919 + 13}) % 2 = 0"
        f" THEN 'h{r}x' || CAST(hash(tok) % 997 AS VARCHAR)"
        f" WHEN hash(doc_id * 1000003 + i * 31 + {r}) % 7 = 0"
        f" THEN 'w{r}x' || CAST(hash(tok) % 997 AS VARCHAR)"
        f" WHEN i % 3 = 0 THEN 'g{g}x' || CAST(hash(tok) % 997 AS VARCHAR)"
        " ELSE tok END"
    )
    perturbed = (
        "array_to_string(list_transform(string_split(text, ' '),"
        f" (tok, i) -> {tok_case}), ' ')"
    )
    return (
        f"CASE WHEN {g} ="
        f" abs(hash(doc_id * 7)) % {max(n_groups, _GROUP_SIZE)}"
        f" THEN text ELSE {perturbed} END"
    )


def _organic_vec(r: int, n_groups: int) -> str:
    """Deterministic per-replica embedding noise: exact copies only from
    the vec's single designated crawl group (same v3 bound + small-N
    floor as the text — cos=1 cliques stay <= {_GROUP_SIZE}+1 at any N
    instead of ~N/10); every other replica gets hash-derived ±0.01
    per-component jitter (cosine near-dups at ~0.999, which hyperplane
    bands must catch)."""
    g = r // _GROUP_SIZE
    noised = (
        "list_transform(embedding, (x, j) -> CAST(x +"
        f" (CAST(hash(vec_id * 131 + j * 17 + {r}) % 2001 AS BIGINT)"
        " - 1000) / 100000.0 AS FLOAT))"
    )
    return (
        f"CASE WHEN {g} ="
        f" abs(hash(vec_id * 7)) % {max(n_groups, _GROUP_SIZE)}"
        f" THEN embedding ELSE {noised} END"
    )


# mode=organic: table -> (replica -> {value_col: replacement_expr});
# replica 0 is always verbatim, and n_chars tracks the perturbed text
def _organic_exprs(t: str, r: int, n: int) -> dict[str, str]:
    n_groups = -(-n // _GROUP_SIZE)  # ceil — groups actually present
    if r == 0:
        return {}
    if t == "documents":
        txt = _organic_text(r, n_groups)
        return {"text": txt, "n_chars": f"length({txt})"}
    if t == "embeddings":
        return {"embedding": _organic_vec(r, n_groups)}
    return {}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    mode = sys.argv[4] if len(sys.argv) > 4 else "replicate"
    assert mode in ("replicate", "organic"), mode
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    strides: dict[tuple[str, str], int] = {}
    for spec in OFFSETS.values():
        for table, key in spec.values():
            if (table, key) not in strides:
                strides[(table, key)] = (
                    con.execute(
                        f"SELECT max({key}) + 1 FROM"
                        f" '{src}/{table}.parquet'"
                    ).fetchone()[0]
                )
    # v3 (r9 verdict task 4): the content tables' strides must NOT be
    # multiples of 10 — the driver frames have max(vec_id)+1 divisible by
    # 10, so replica offsets preserved vec_id % 10 and a verbatim twin of
    # a test vector (vec_id % 10 = 0) was ALWAYS itself a test vector:
    # organic frames could never exercise the leakage gate's cross-split
    # recall audit (n_leak_exact was structurally 0). A stride = 1 (mod
    # 10) walks each replica's twins through every residue, so test
    # vectors organically acquire train-side near-identical twins (same
    # for the documents split slices). Relational strides stay exact —
    # no split semantics key on their residues.
    for tk in (("documents", "doc_id"), ("embeddings", "vec_id")):
        while strides[tk] % 10 == 0:
            strides[tk] += 1

    for t in VERBATIM:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet')"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied verbatim", flush=True)

    for t, spec in OFFSETS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for r in range(n):
            organic = _organic_exprs(t, r, n) if mode == "organic" else {}
            exprs = []
            for c in cols:
                if c in spec:
                    stride = strides[spec[c]]
                    # preserve the source column type (BIGINT keys)
                    exprs.append(f"CAST({c} + {r} * {stride} AS BIGINT) AS {c}")
                elif c in organic:
                    exprs.append(f"{organic[c]} AS {c}")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)})"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'"
        ).fetchone()[0]
        print(t, rows, "rows", flush=True)


if __name__ == "__main__":
    main()
