"""Text-analysis stages (training-data curation over the ``documents`` table).

All stages are map_batches callables; the stats kernel is pandas/C-vectorized
(functions/text_stats.py documents the SQL-parity contract for the oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.text_stats import doc_fingerprint, lang_id_scores, quality_stats_frame


class TextStatsStage:
    """Adds n_chars/n_tokens/char-class counts + quality ratios."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        stats = quality_stats_frame(batch[self.text_col])
        for c in stats.columns:
            batch[c] = stats[c].to_numpy()
        return batch


class LangIdStage:
    """Adds ``lang_pred`` via the deterministic stopword-voting heuristic."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_pred"] = [lang_id_scores(t) for t in batch[self.text_col].fillna("")]
        return batch


class FingerprintStage:
    """Adds ``fingerprint`` (winnowing-style min rolling hash, int64)."""

    def __init__(self, text_col: str = "text", k: int = 8):
        self.text_col = text_col
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = np.fromiter(
            (doc_fingerprint(t, self.k) for t in batch[self.text_col].fillna("")),
            dtype=np.int64,
            count=len(batch),
        )
        return batch


def quality_filter(batch: pa.Table, min_tokens: int = 5, max_punct_ratio: float = 0.3) -> pa.Table:
    """Vectorized Arrow-side quality gate (example curation filter)."""
    import pyarrow.compute as pc

    ok = pc.and_(
        pc.greater_equal(batch["n_tokens"], min_tokens),
        pc.less_equal(batch["punct_ratio"], max_punct_ratio),
    )
    return batch.filter(ok)
