"""Shared text-processing column expressions (JVM-side, no Python UDFs).

One tokenization convention used by every text operator AND mirrored
verbatim in the DuckDB oracles: trim → split on runs of spaces. The
fixture `documents.text` is already lowercase space-separated tokens;
the regexes stay in the Java∩RE2 common dialect so both engines agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Whitespace tokens. Oracle twin: string_split_regex(trim(x), ' +')."""
    return F.split(F.trim(col), " +")


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokens(col))


def shingles3(col: Column) -> Column:
    """Distinct 3-word shingles.

    Built by zipping the token array with its 1- and 2-shifted selves —
    NOT by indexing element_at(t, i) inside a positional transform: an
    expression referenced inside an interpreted lambda is re-evaluated per
    call, so the indexed form re-runs the split O(len²) times per row
    (measured 3.5 s → 0.3 s on 5k docs for this one change).

    Oracle twin:
      list_distinct(list_transform(generate_series(1, len(t)-2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
    """
    t = tokens(col)
    n = F.size(t)
    t2 = F.slice(t, 2, n)
    t3 = F.slice(t, 3, n)
    # zip_with pads the shorter side with NULL and concat_ws skips NULLs,
    # so the last two entries are 2-/1-grams — sliced off to length n-2.
    pairs = F.zip_with(t, t2, lambda x, y: F.concat_ws(" ", x, y))
    triples = F.zip_with(pairs, t3, lambda p, z: F.concat_ws(" ", p, z))
    raw = F.slice(triples, F.lit(1), F.greatest(n - 2, F.lit(0)))
    return F.when(n >= 3, F.array_distinct(raw)).otherwise(F.array().cast("array<string>"))


def shingles(col: Column, width: int) -> Column:
    """Distinct `width`-word shingles — same shifted-zip construction as
    shingles3 (no element_at indexing inside lambdas; see that docstring).

    Oracle twin:
      list_distinct(list_transform(generate_series(1, len(t) - W + 1),
                    i -> array_to_string(t[i:i+W-1], ' ')))
    """
    t = tokens(col)
    n = F.size(t)
    acc = t
    for k in range(2, width + 1):
        acc = F.zip_with(acc, F.slice(t, k, n), lambda p, z: F.concat_ws(" ", p, z))
    raw = F.slice(acc, F.lit(1), F.greatest(n - (width - 1), F.lit(0)))
    return F.when(n >= width, F.array_distinct(raw)).otherwise(F.array().cast("array<string>"))


def bigrams(col: Column) -> Column:
    """ALL adjacent word bigrams (duplicates kept — repetition metrics need
    the multiset). Same shifted-zip construction as shingles3.

    Oracle twin:
      list_transform(list_zip(t[1:len(t)-1], t[2:len(t)]),
                     z -> z[1] || ' ' || z[2])
    """
    t = tokens(col)
    n = F.size(t)
    pairs = F.zip_with(t, F.slice(t, 2, n), lambda x, y: F.concat_ws(" ", x, y))
    raw = F.slice(pairs, F.lit(1), F.greatest(n - 1, F.lit(0)))
    return F.when(n >= 2, raw).otherwise(F.array().cast("array<string>"))


def minhash_signature(shingle_col: Column, num_hashes: int) -> Column:
    """MinHash signature as array<string>: per seed s, the lexicographic min
    of md5(s || '|' || shingle). md5 is identical across engines, so the
    signature (and thus LSH banding) is engine-independent — unlike
    murmur-based `hash()`, which differs between Spark and DuckDB.

    Oracle twin:
      list_transform(generate_series(0, N-1),
        s -> list_min(list_transform(sh, x -> md5(s::VARCHAR || '|' || x))))
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(
                shingle_col, lambda sh: F.md5(F.concat(s.cast("string"), F.lit("|"), sh))
            )
        ),
    )


def prefix_tokens(set_col: Column, tau: float) -> Column:
    """PPJoin-style prefix filter for Jaccard threshold joins — provably
    recall-complete candidate generation without an all-pairs product.

    Lemma (Chaudhuri/Bayardo all-pairs similarity): order every token by a
    global total order; if J(a,b) >= tau then |a ∩ b| >= α where
    α = max(ceil(tau·|a|), ceil(tau·|b|)), and the first |x| - α + 1
    tokens of each set must share at least one element. Taking each set's
    prefix of length |x| - ceil(tau·|x|) + 1 (>= |x| - α + 1) preserves
    the guarantee, so an equi-join on prefix tokens finds EVERY qualifying
    pair. The global order here is md5(token) — deterministic and
    engine-independent; frequency order would prune harder but needs a
    corpus pass (the 100 TB variant computes token doc-frequencies first
    and orders rarest-first).
    """
    keyed = F.array_sort(
        F.transform(set_col, lambda s: F.struct(F.md5(s).alias("k"), s.alias("v")))
    )
    plen = F.greatest(
        F.size(set_col) - F.ceil(F.lit(tau) * F.size(set_col)).cast("int") + 1, F.lit(0)
    )
    return F.transform(F.slice(keyed, F.lit(1), plen), lambda kv: kv["v"])
