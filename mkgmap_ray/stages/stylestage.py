"""Style application as an actor-pool map_batches stage.

The reference compiles the style once and shares it across every element
of a tile (``osmstyle/StyledConverter.java:89-182``); here the compiled
``RuleSet`` is built once per actor in ``__init__`` (or passed pre-built
via ``ray.put``), and ``__call__`` runs the vectorized rule program over
each batch's tag columns.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..style import compile_style


class StyleApply:
    """map_batches callable: tag columns in → gtype/resolution/name out.

    ``tag_columns`` maps style tag name → input column name, the
    column-pruned equivalent of the reference's used-tags projection.
    """

    def __init__(self, style_text: str, tag_columns: dict[str, str],
                 keep: list[str] | None = None):
        self.ruleset = compile_style(style_text)
        self.tag_columns = tag_columns
        self.keep = keep or []

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tags = {
            tag: batch[col].to_pandas().astype("string")
            for tag, col in self.tag_columns.items()
        }
        res = self.ruleset.apply(tags, n)
        out = {c: batch[c] for c in self.keep}
        out["gtype"] = pa.array(res["gtype"], pa.int32())
        out["resolution"] = pa.array(res["resolution"], pa.int32())
        out["matched_rule"] = pa.array(res["matched_rule"], pa.int32())
        out["name"] = pa.Array.from_pandas(res["name"], type=pa.string())
        return pa.table(out)


def apply_style(ds, style_text: str, tag_columns: dict[str, str],
                keep: list[str] | None = None, **kw):
    from ..util import pool_concurrency

    kw.setdefault("concurrency", pool_concurrency())
    return ds.map_batches(
        StyleApply,
        fn_constructor_kwargs=dict(
            style_text=style_text, tag_columns=tag_columns, keep=keep
        ),
        batch_format="pyarrow",
        batch_size=None,
        **kw,
    )
