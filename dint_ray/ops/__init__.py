"""Large-scale training-data operations: dedup, similarity search,
text analysis, multimodal plumbing."""


def project_columns(ds, cols=("doc_id", "text")):
    """Narrow ``ds`` to ``cols`` when its schema is already known (a
    fresh read) and carries extra columns.  Applied at every text-op
    entry point so a `read_parquet(pages)` input only decodes the
    columns the operator touches — the fixture's `html` column alone
    is ~half the corpus bytes (prune-at-the-read, ray_guide).  Datasets
    with unknown schema pass through untouched (no execution is
    triggered just to prune)."""
    try:
        have = ds.columns(fetch_if_missing=False)
    except Exception:
        return ds
    want = set(cols)
    if have and want <= set(have) and set(have) - want:
        return ds.select_columns(list(cols))
    return ds
