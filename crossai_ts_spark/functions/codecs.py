"""Gorilla XOR float64 codec + delta-of-delta integer codec.

Public-knowledge design: Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015 (§4.1 timestamps, §4.2 values).

Values (float64, Gorilla §4.2):
  - first value: 64 raw bits
  - next: XOR with previous;
      xor == 0            -> '0'
      reusable block      -> '10' + meaningful bits (prev leading/length)
      new block           -> '11' + 5b leading-zeros + 6b (sig_len - 1)
                             + sig_len meaningful bits
    (leading zeros capped at 31 so they fit 5 bits)

Offsets / timestamps (int64, Gorilla §4.1 buckets, widened for generality):
  - first offset: 64 raw bits; then per point on delta-of-delta D:
      D == 0              -> '0'
      -63   <= D <= 64    -> '10'   + 7b  (D + 63)
      -255  <= D <= 256   -> '110'  + 9b  (D + 255)
      -2047 <= D <= 2048  -> '1110' + 12b (D + 2047)
      else                -> '1111' + 64 raw bits (zig-zag not needed)
  The second point's delta is stored as a full 64-bit value after the
  header (our streams are blocks, not 2-hour aligned windows).

Bit-pattern fidelity: NaN payloads, ±0.0, infs and denormals round-trip
bit-exactly (everything goes through uint64 views, never through float
arithmetic).

The Spark surface is ``compress_tiers`` / ``decompress_tiers``:
grouped ``applyInPandas`` per (doc_id, tier), input sorted by window_start
INSIDE the group (secondary sort in pandas — SURVEY §4.3.3) so encoded
blobs are deterministic under any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# ------------------------------------------------------------------ bits


class BitWriter:
    """Append-only bit stream (MSB-first within each byte)."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0  # bit accumulator (int)
        self.nbits = 0  # bits currently in acc

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.nbits:
            out.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(out)


class BitReader:
    """MSB-first bit stream reader."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        end = self.pos + nbits
        first_byte = self.pos >> 3
        last_byte = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first_byte:last_byte], "big")
        total_bits = (last_byte - first_byte) * 8
        chunk >>= total_bits - (end - first_byte * 8)
        self.pos = end
        return chunk & ((1 << nbits) - 1)


# ------------------------------------------------------------ gorilla f64


def gorilla_encode(values: np.ndarray) -> bytes:
    """Encode float64 array -> bytes (header: 8-byte big-endian count)."""
    values = np.ascontiguousarray(values, dtype=np.float64)
    bits = values.view(np.uint64)
    n = values.size
    w = BitWriter()
    w.write(n, 64)
    if n == 0:
        return w.getvalue()
    prev = int(bits[0])
    w.write(prev, 64)
    # vectorized precompute of xors + leading/trailing zero counts
    if n > 1:
        xors = bits[1:] ^ bits[:-1]
        prev_lead, prev_sig = -1, -1
        for x in map(int, xors):
            if x == 0:
                w.write(0, 1)
                continue
            lead = min(64 - x.bit_length(), 31)
            trail = (x & -x).bit_length() - 1
            sig = 64 - lead - trail
            prev_trail = 64 - prev_lead - prev_sig
            if prev_lead >= 0 and lead >= prev_lead and trail >= prev_trail:
                # reuse previous block: '10' + prev_sig bits
                w.write(0b10, 2)
                w.write(x >> (64 - prev_lead - prev_sig), prev_sig)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(sig - 1, 6)
                w.write(x >> trail, sig)
                prev_lead, prev_sig = lead, sig
    return w.getvalue()


def gorilla_decode(blob: bytes) -> np.ndarray:
    r = BitReader(blob)
    n = r.read(64)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    cur = r.read(64)
    out[0] = cur
    lead, sig = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = cur
            continue
        if r.read(1) == 0:  # '10': reuse block
            mean_bits = r.read(sig)
            x = mean_bits << (64 - lead - sig)
        else:  # '11': new block
            lead = r.read(5)
            sig = r.read(6) + 1
            mean_bits = r.read(sig)
            x = mean_bits << (64 - lead - sig)
        cur ^= x
        out[i] = cur
    return out.view(np.float64)


# -------------------------------------------------------- delta-of-delta


def dod_encode(offsets: np.ndarray) -> bytes:
    """Encode int64 array -> bytes (header: count, first, first delta)."""
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    n = offsets.size
    w = BitWriter()
    w.write(n, 64)
    if n == 0:
        return w.getvalue()
    w.write(int(offsets[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    # deltas in Python ints (mod-2^64 consistent with the decoder) so
    # adjacent values near ±2^62 can't overflow an int64 diff
    py = [int(v) for v in offsets]
    deltas = [b - a for a, b in zip(py, py[1:])]
    w.write(deltas[0] & ((1 << 64) - 1), 64)
    dods = [b - a for a, b in zip(deltas, deltas[1:])]
    for d in dods:
        if d == 0:
            w.write(0, 1)
        elif -63 <= d <= 64:
            w.write(0b10, 2)
            w.write(d + 63, 7)
        elif -255 <= d <= 256:
            w.write(0b110, 3)
            w.write(d + 255, 9)
        elif -2047 <= d <= 2048:
            w.write(0b1110, 4)
            w.write(d + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(d & ((1 << 64) - 1), 64)
    return w.getvalue()


def _toi64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def dod_decode(blob: bytes) -> np.ndarray:
    r = BitReader(blob)
    n = r.read(64)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    mask = (1 << 64) - 1
    cur = r.read(64)  # kept unsigned mod 2^64 (wrap-consistent with encoder)
    out[0] = _toi64(cur)
    if n == 1:
        return out
    delta = r.read(64)
    for i in range(1, n):
        if i > 1:
            if r.read(1) == 1:
                if r.read(1) == 0:
                    d = r.read(7) - 63
                elif r.read(1) == 0:
                    d = r.read(9) - 255
                elif r.read(1) == 0:
                    d = r.read(12) - 2047
                else:
                    d = r.read(64)
                delta = (delta + d) & mask
        cur = (cur + delta) & mask
        out[i] = _toi64(cur)
    return out


# --------------------------------------------------------- spark surface


# Vectorized fast paths (bit-identical to the golden encoders above;
# verified by tests/test_codecs_fast.py). The golden per-value encoders stay
# as the reference the fast paths must bit-match.
from .codecs_fast import dod_decode_fast, dod_encode_fast, gorilla_encode_fast  # noqa: E402


def compress_group(pdf: pd.DataFrame, value_col: str = "t_mean") -> pd.DataFrame:
    """One (doc_id, tier) group -> one compressed-segment row.

    Sorts by window_start inside the group (secondary sort) so the blob is
    identical under any shuffle/partitioning.
    """
    pdf = pdf.sort_values("window_start")
    offs = pdf["window_start"].to_numpy(dtype=np.int64)
    vals = pdf[value_col].to_numpy(dtype=np.float64)
    return pd.DataFrame(
        {
            "doc_id": [pdf["doc_id"].iloc[0]],
            "source": [pdf["source"].iloc[0]],
            "tier": [np.int32(pdf["tier"].iloc[0])],
            "n_points": [np.int64(len(pdf))],
            "codec": ["gorilla+dod/v1"],
            "ts_blob": [dod_encode(offs)],
            "val_blob": [gorilla_encode(vals)],
        }
    )


def compress_tiers_grouped(tier_df, value_col: str = "t_mean"):
    """Reference implementation: one applyInPandas call per (doc_id, tier).

    Correct but slow at scale — Spark materializes a pandas DataFrame PER
    GROUP (~180k tiny frames for 60k docs x 3 tiers); use compress_tiers."""
    from ..schema import COMPRESSED_TIER_SCHEMA

    return tier_df.groupBy("doc_id", "tier").applyInPandas(
        lambda pdf: compress_group(pdf, value_col), schema=COMPRESSED_TIER_SCHEMA
    )


def compress_tiers(tier_df, value_col: str = "t_mean", partitions: int | None = None):
    """tier rows -> compressed segments, one per (doc_id, tier).

    Batched path: repartition on doc_id (one shuffle), sortWithinPartitions
    (doc_id, tier, window_start) for deterministic blobs, then a single
    mapInPandas kernel that slices groups out of each Arrow batch with
    numpy boundary detection — no per-group pandas materialization. Groups
    split across Arrow batch boundaries are carried over and merged (the
    partition-level sort makes group rows contiguous).

    Blobs are bitwise-identical to compress_tiers_grouped (tested).
    """
    from ..schema import COMPRESSED_TIER_SCHEMA

    spark = tier_df.sparkSession
    if partitions is None:
        # default to spark.sql.shuffle.partitions (the cluster-tuned knob),
        # NOT a 4x multiple of it: the encode stage is CPU-bound in the
        # Python runner, so each extra task costs ~5-10 ms of runner
        # round-trip — the old 4x count measured 1.74 s vs 0.75 s at 1x on
        # the sf0.1 tier table at local[32]. An UNPINNED repartition("doc_id")
        # is wrong in the other direction: AQE's byte-based coalescing sees
        # a few MB and folds the stage to ~1 partition, serializing the
        # encode (measured 4.2 s). Zipf doc-length skew is bounded (a doc
        # caps at 64 Ki tokens -> <=2048 tier-1 windows), so 1x
        # cluster-width tasks don't straggle; callers can still pin a count.
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    def kernel(batches):
        pend: pd.DataFrame | None = None

        def encode_block(pdf: pd.DataFrame):
            doc_np = pdf["doc_id"].to_numpy()
            tier_np = pdf["tier"].to_numpy()
            src_np = pdf["source"].to_numpy()
            keys = (pdf["doc_id"].astype(str) + "\x1f" + pdf["tier"].astype(str)).to_numpy()
            brk = np.nonzero(keys[1:] != keys[:-1])[0] + 1
            bounds = np.concatenate(([0], brk, [len(pdf)]))
            offs_all = pdf["window_start"].to_numpy(dtype=np.int64)
            vals_all = pdf[value_col].to_numpy(dtype=np.float64)
            starts, ends = bounds[:-1], bounds[1:]
            # columnar assembly: per-group work is just the two encoders
            # (no per-group pandas scalar lookups / row tuples)
            return pd.DataFrame(
                {
                    "doc_id": doc_np[starts],
                    "source": src_np[starts],
                    "tier": tier_np[starts].astype(np.int32),
                    "n_points": (ends - starts).astype(np.int64),
                    "codec": np.repeat("gorilla+dod/v1", starts.size),
                    "ts_blob": [dod_encode_fast(offs_all[s:e]) for s, e in zip(starts, ends)],
                    "val_blob": [gorilla_encode_fast(vals_all[s:e]) for s, e in zip(starts, ends)],
                }
            )

        for pdf in batches:
            if pend is not None:
                pdf = pd.concat([pend, pdf], ignore_index=True)
                pend = None
            if len(pdf) == 0:
                continue
            # hold back the trailing group: it may continue in the next batch
            last_doc = pdf["doc_id"].iloc[-1]
            last_tier = pdf["tier"].iloc[-1]
            tail_mask = (pdf["doc_id"] == last_doc) & (pdf["tier"] == last_tier)
            # rows are sorted, so the tail group is a contiguous suffix
            split = len(pdf) - int(tail_mask.to_numpy()[::-1].argmin()) if not tail_mask.all() else 0
            pend = pdf.iloc[split:].copy()
            head = pdf.iloc[:split]
            if len(head):
                yield encode_block(head)
        if pend is not None and len(pend):
            yield encode_block(pend)

    ordered = tier_df.repartition(partitions, "doc_id").sortWithinPartitions(
        "doc_id", "tier", "window_start"
    )
    return ordered.mapInPandas(kernel, schema=COMPRESSED_TIER_SCHEMA)


def decompress_tiers(seg_df):
    """Compressed segments -> (doc_id, source, tier, window_start, value) rows.

    Per-segment work is just the two decoders (offsets via the vectorized
    dod_decode_fast — bit-identical to the golden decoder, tested); the
    output batch is assembled once per Arrow batch with np.repeat /
    np.concatenate instead of one pandas frame per segment.
    """

    def decode(batches):
        for pdf in batches:
            offs_l = [dod_decode_fast(bytes(b)) for b in pdf["ts_blob"]]
            vals_l = [gorilla_decode(bytes(b)) for b in pdf["val_blob"]]
            if not offs_l:
                continue
            n = np.array([o.size for o in offs_l], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), n),
                    "source": np.repeat(pdf["source"].to_numpy(), n),
                    "tier": np.repeat(pdf["tier"].to_numpy().astype(np.int32), n),
                    "window_start": np.concatenate(offs_l),
                    "value": np.concatenate(vals_l),
                }
            )

    schema = "doc_id string, source string, tier int, window_start long, value double"
    return seg_df.mapInPandas(decode, schema=schema)


# ------------------------------------------------- token round-trip codec


def tokens_roundtrip_check(df):
    """decode(encode(tokens)) == tokens, per row — the input_hint invariant.

    Runs entirely inside mapInPandas; returns (doc_id, n_tok, ok boolean).
    """

    def check(batches):
        for pdf in batches:
            oks = []
            for toks in pdf["tokens"]:
                arr = np.asarray(toks, dtype=np.int64)
                rt = dod_decode_fast(dod_encode_fast(arr))
                oks.append(bool(np.array_equal(rt, arr)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_tok": pdf["n_tok"], "ok": oks}
            )

    return df.mapInPandas(check, schema="doc_id string, n_tok int, ok boolean")


def tokens_roundtrip_sums(df):
    """Round-trip check + sums recomputed from the DECODED arrays.

    dec_sum / dec_wsum are computed from decode(encode(tokens)) — NOT from
    the input — so a cross-engine oracle that recomputes the same sums from
    the source text independently verifies the codec (any decode corruption
    shifts the sums; the position-weighted sum catches reorderings that a
    plain sum would miss).
    """

    def check(batches):
        for pdf in batches:
            oks, sums, wsums = [], [], []
            for toks in pdf["tokens"]:
                arr = np.asarray(toks, dtype=np.int64)
                rt = dod_decode_fast(dod_encode_fast(arr))
                oks.append(bool(np.array_equal(rt, arr)))
                sums.append(int(rt.sum()))
                wsums.append(int((rt * np.arange(1, len(rt) + 1)).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ok": oks,
                    "dec_sum": np.asarray(sums, dtype=np.int64),
                    "dec_wsum": np.asarray(wsums, dtype=np.int64),
                }
            )

    return df.mapInPandas(
        check, schema="doc_id string, ok boolean, dec_sum long, dec_wsum long"
    )
