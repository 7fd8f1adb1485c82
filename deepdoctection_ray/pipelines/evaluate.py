"""Extraction evaluator: golden vs produced output → distributed metrics.

The ``Evaluator`` analog (``eval/eval.py:57-218``): instead of re-running a
pipeline over a dataset builder and handing two DataFlows to a metric, both
sides are Datasets keyed by (conv_id, turn_idx); the comparison is a keyed
join (groupby the composite key) and the metrics reduce distributed
(``eval/accmetric.py:81-109`` accuracy shape).
"""

from __future__ import annotations

import pandas as pd

import ray.data
from ray.data.aggregate import Count, Sum


def evaluate_extraction(
    golden: ray.data.Dataset,
    produced: ray.data.Dataset,
    key_columns: tuple[str, str] = ("conv_id", "turn_idx"),
    text_column: str = "extracted_text",
) -> dict:
    """Per-turn text-equality metrics between two extraction outputs.

    Returns exact-match rate, counts of missing/extra turns, and per
    payload-kind accuracy when the column is present.
    """
    keys = list(key_columns)

    def tag(ds: ray.data.Dataset, side: str) -> ray.data.Dataset:
        cols = keys + [text_column] + (["payload_kind"] if "payload_kind" in ds.schema().names else [])
        return ds.select_columns(cols).add_column(
            "side", lambda df: pd.Series([side] * len(df)), batch_format="pandas"
        )

    both = tag(golden, "g").union(tag(produced, "p"))

    def judge(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group["side"] == "g"]
        p = group[group["side"] == "p"]
        kind = group["payload_kind"].iloc[0] if "payload_kind" in group.columns else ""
        if len(g) and len(p):
            match = int(g[text_column].iloc[0] == p[text_column].iloc[0])
            status = "match" if match else "mismatch"
        elif len(g):
            status = "missing"
        else:
            status = "extra"
        return pd.DataFrame({"status": [status], "kind": [kind], "n": [1]})

    verdicts = both.groupby(keys).map_groups(judge, batch_format="pandas")
    counts = {r["status"]: r["n"] for r in verdicts.groupby("status").aggregate(Sum("n", alias_name="n")).take_all()}
    by_kind = {
        (r["kind"], r["status"]): r["n"]
        for r in verdicts.groupby(["kind", "status"]).aggregate(Sum("n", alias_name="n")).take_all()
    }
    total_compared = counts.get("match", 0) + counts.get("mismatch", 0)
    return {
        "exact_match_rate": (counts.get("match", 0) / total_compared) if total_compared else 0.0,
        "matched": counts.get("match", 0),
        "mismatched": counts.get("mismatch", 0),
        "missing": counts.get("missing", 0),
        "extra": counts.get("extra", 0),
        "by_kind": {
            kind: by_kind.get((kind, "match"), 0)
            / max(by_kind.get((kind, "match"), 0) + by_kind.get((kind, "mismatch"), 0), 1)
            for kind, _ in by_kind
        },
    }
