"""Content-defined chunking (CDC): rolling-hash boundary detection.

Fixed-size chunking (`doc_chunking`) shifts every boundary when one byte is
inserted; CONTENT-DEFINED boundaries (cut where a rolling hash of the last
W bytes hits 0 mod D — the Rabin/LBFS scheme, avg chunk ≈ D bytes) realign
after edits, which is what makes chunk-level dedup work on near-identical
documents.  The hash here is the exact polynomial Σ b[p-W+1+j]·31^(W-1-j)
in int64 (W=8, max value ≈ 5.6e13 — no modular reduction needed, so both
engines compute the identical integer), and the boundary rule is
h % 64 == 0 at 0-based byte positions ≥ W−1 (the first full window ends at
index W−1; the SQL oracle states the same rule 1-based as i ≥ W).

Vectorized: the rolling hash for ALL positions of a batch's concatenated
payloads is a sum of 8 shifted views × constant powers (one numpy pass);
per-chunk digests hash the UPPERCASE HEX of the chunk bytes (hex is ASCII,
so the digest is expressible to a SQL oracle for any payload — the
`fake_resize_image` trick).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

WINDOW = 8
DIVISOR = 64  # boundary when h % DIVISOR == 0 → avg chunk ≈ 64 bytes
_POWERS = [31 ** (WINDOW - 1 - j) for j in range(WINDOW)]


def cdc_chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Input batches: (doc_id: int64, payload: bytes, len >= WINDOW).
    Output: (doc_id, chunk_idx, start_pos, chunk_len, chunk_md5) — chunk
    boundaries AFTER the byte whose trailing-W window hash ≡ 0 (mod D);
    start_pos is 0-based; the trailing remainder is the final chunk."""
    import hashlib

    import numpy as np

    for pdf in batches:
        if len(pdf) == 0:
            continue
        out_doc, out_idx, out_start, out_len, out_md5 = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n = b.size
            # h[p] for p = WINDOW-1 .. n-1 (0-based end of each window)
            h = np.zeros(n - WINDOW + 1, dtype=np.int64)
            for j, pw in enumerate(_POWERS):
                h += b[j : j + n - WINDOW + 1] * pw
            ends = np.nonzero(h % DIVISOR == 0)[0] + WINDOW - 1  # boundary bytes
            starts = np.concatenate(([0], ends + 1))
            stops = np.concatenate((ends + 1, [n]))
            keep = starts < stops  # a boundary at the last byte → no empty tail
            starts, stops = starts[keep], stops[keep]
            for idx, (s, e) in enumerate(zip(starts, stops)):
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_start.append(int(s))
                out_len.append(int(e - s))
                out_md5.append(
                    hashlib.md5(payload[s:e].hex().upper().encode("ascii")).hexdigest()
                )
        yield pd.DataFrame(
            {
                "doc_id": pd.array(out_doc, dtype="int64"),
                "chunk_idx": pd.array(out_idx, dtype="int64"),
                "start_pos": pd.array(out_start, dtype="int64"),
                "chunk_len": pd.array(out_len, dtype="int64"),
                "chunk_md5": out_md5,
            }
        )
