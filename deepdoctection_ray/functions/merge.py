"""Merge two per-turn datasets by key — the ``merge_datapoints`` analog.

Reference (``dd_core/src/dd_core/mapper/misc.py:245-288``) unions the
annotations of two ``Image`` records with the same id (e.g. layout from one
pass, OCR from another). Here two extraction/enrichment Datasets keyed by
(conv_id, turn_idx) merge columns: the right side contributes the columns the
left lacks; on a column clash the left wins (first-pass precedence, matching
the reference's "existing annotation ids are not overwritten").
"""

from __future__ import annotations

import pandas as pd

import ray.data


def merge_by_key(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_columns: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> ray.data.Dataset:
    keys = list(key_columns)
    left_cols = left.schema().names
    right_only = [c for c in right.schema().names if c not in left_cols]

    l = left.add_column("__side", lambda df: pd.Series(["l"] * len(df)), batch_format="pandas")
    r = right.select_columns(keys + right_only).add_column(
        "__side", lambda df: pd.Series(["r"] * len(df)), batch_format="pandas"
    )
    both = l.union(r)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"].drop(columns=["__side"])
        rg = g[g["__side"] == "r"]
        if lg.empty:
            return pd.DataFrame()
        out = lg[[c for c in lg.columns if c in left_cols]].head(1).reset_index(drop=True)
        for c in right_only:
            out[c] = rg[c].iloc[0] if len(rg) else None
        return out

    return both.groupby(keys).map_groups(combine, batch_format="pandas")
