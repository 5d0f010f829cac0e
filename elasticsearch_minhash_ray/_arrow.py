"""Small Arrow interop helpers shared by the stages."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def table_from_pandas(df: pd.DataFrame) -> pa.Table:
    """``pa.Table.from_pandas`` without the ``b'pandas'`` schema-metadata blob.

    The blob makes ``pa.Schema`` unhashable (dict inside), which defeats Ray
    Data's block-schema dedup — every downstream task logs "Failed to hash
    the schemas" and pays the slow unification path. Stages must emit
    metadata-free schemas so blocks from different tasks compare equal.
    """
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
