"""Corpus curation — the composed training-data pipeline this engine
exists for: language/quality filtering → exact dedup → near-dedup,
all streaming, producing the curated document set.

    documents ──► fused feature pass (ONE tokenize: lang, quality,
                  token counts) ──► filter (quality ≥ τ, lang ∈ L)
              ──► exact dedup (md5 groupby, keep lowest id)
              ──► SimHash near-dedup (bit-band LSH pairs, drop the
                  higher id of every pair — one shot against the
                  post-exact set, deterministic)
              ──► curated (doc_id, pred_lang, n_tokens, quality)

Scale shape: one feature pass over the text; the only text-bearing
shuffle is the SimHash band explode of the already-filtered survivors;
id-set subtraction is a hash-partitioned co-group (never a driver-side
set).  The filtered set and the exact-dedup survivors are checkpointed
in the (spillable) object store because each feeds two downstream
consumers — re-running the tokenize+score pass per consumer costs more
than spill at every scale; nothing is ever pulled to the driver.
Every stage reuses the individually oracle-checked operators,
and the composition itself is SQL-oracle-checked end-to-end
(driver query ``curate_corpus``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..tokenizer import flat_tokens
from ..functions.common import md5_hex_batch, round6
from ..functions.text import LANG_ORDER, QUALITY_STOPWORDS, STOPWORDS, _stop_hits


def curate_features_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """ONE tokenize pass → per-doc (doc_id, text, pred_lang, n_tokens,
    quality) — the fused form of lang_id_batch + quality_batch
    (identical pred_lang/quality values, half the string work;
    stop_ratio/mean_token_len stay internal to the quality score)."""
    n_docs = batch.num_rows
    toks, parent, counts = flat_tokens(batch[text_col])
    hits = np.stack([_stop_hits(toks, parent, n_docs, STOPWORDS[lang]) for lang in LANG_ORDER])
    best = np.argmax(hits, axis=0)
    n_tokens = counts.astype(np.float64)
    n_stop = _stop_hits(toks, parent, n_docs, QUALITY_STOPWORDS).astype(np.float64)
    lens = np.asarray(pc.utf8_length(toks).to_numpy(zero_copy_only=False), dtype=np.float64)
    tok_chars = np.bincount(parent, weights=lens, minlength=n_docs)
    safe_n = np.maximum(n_tokens, 1.0)
    stop_ratio = n_stop / safe_n
    mean_len = tok_chars / safe_n
    quality = (
        0.4 * np.minimum(n_tokens / 100.0, 1.0)
        + 0.3 * (1.0 - stop_ratio)
        + 0.3 * np.minimum(mean_len / 8.0, 1.0)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            text_col: batch[text_col],
            "pred_lang": pa.array(np.array(LANG_ORDER, dtype=object)[best], type=pa.string()),
            "n_tokens": pa.array(n_tokens.astype(np.int64)),
            "quality": pa.array(round6(quality), pa.float64()),
        }
    )


def curate_corpus(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    min_quality: float = 0.5,
    langs: "list[str] | None" = None,
    exact_dedup: bool = True,
    near_dedup: bool = True,
    max_hamming: int = 3,
    bands: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Curated corpus: (doc_id, pred_lang, n_tokens, quality) of the
    documents that survive quality/language filtering, exact dedup
    (keep lowest id per identical text) and SimHash near-dedup (drop
    the higher id of every Hamming-≤k pair, computed ONCE against the
    post-exact-dedup set)."""
    from ..functions.common import default_partitions, subtract_ids
    from ..functions.dedup import simhash_neardup_pairs

    P = num_partitions or default_partitions()
    # `is not None`: an EXPLICIT empty allow-list means "no language
    # passes", not "filter disabled"
    lang_set = pa.array(list(langs), pa.string()) if langs is not None else None

    def features_and_filter(b: pa.Table) -> pa.Table:
        f = curate_features_batch(b, text_col)
        keep = pc.greater_equal(f["quality"], min_quality)
        if lang_set is not None:
            keep = pc.and_(keep, pc.is_in(f["pred_lang"], value_set=lang_set))
        return f.filter(keep)

    # Materialize the feature pass once: it feeds BOTH the drop-set
    # pipeline and the anti-join's data side — without this the full
    # tokenize+score pass re-executes per consumer.
    filtered = ds.map_batches(features_and_filter, batch_format="pyarrow").materialize()

    survivors = filtered
    if exact_dedup:
        # drops = filtered ids minus the per-hash keepers: co-group on
        # the hash, emit every id except the minimum
        def tag_pairs(b: pa.Table) -> pa.Table:
            return pa.table({"h": md5_hex_batch(pc.fill_null(b[text_col], "")),
                             "doc_id": b["doc_id"].cast(pa.int64())})

        hashed = survivors.map_batches(tag_pairs, batch_format="pyarrow")

        def tag_part(b: pa.Table) -> pa.Table:
            from ..functions.common import md5_u64_batch

            hp = md5_u64_batch(b["h"].combine_chunks())
            return b.append_column("_part", pa.array((hp % np.uint64(P)).astype(np.int64)))

        def emit_drops(group: pa.Table) -> pa.Table:
            from ..functions.common import sorted_runs

            h = np.asarray(group["h"].to_pylist(), dtype=object)
            ids = np.asarray(group["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
            order = np.lexsort((ids, h))
            h, ids = h[order], ids[order]
            starts, _counts = sorted_runs(h)
            first = np.zeros(len(h), dtype=bool)
            first[starts] = True
            return pa.table({"drop_id": pa.array(ids[~first])})

        drops = (
            hashed.map_batches(tag_part, batch_format="pyarrow")
            .groupby("_part")
            .map_groups(emit_drops, batch_format="pyarrow")
        )
        # consumed twice below (near-dup pair generation + anti-join)
        survivors = subtract_ids(survivors, drops, id_col="doc_id", num_partitions=P).materialize()

    if near_dedup:
        pairs = simhash_neardup_pairs(
            survivors, max_hamming=max_hamming, bands=bands, text_col=text_col,
            num_partitions=P,
        )

        def pair_drops(b: pa.Table) -> pa.Table:
            if not b.num_columns or not b.num_rows:
                return pa.table({"drop_id": pa.array([], pa.int64())})
            return pa.table({"drop_id": b["b"].cast(pa.int64())})

        survivors = subtract_ids(
            survivors, pairs.map_batches(pair_drops, batch_format="pyarrow"),
            id_col="doc_id", num_partitions=P,
        )

    def project(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "pred_lang": b["pred_lang"],
                "n_tokens": b["n_tokens"],
                "quality": b["quality"],
            }
        )

    return survivors.map_batches(project, batch_format="pyarrow")
