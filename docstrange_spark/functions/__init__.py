"""Column-level helpers over span arrays — the engine's O1/O5-style ops
as pure Catalyst expressions (no Python), usable before the kernel to
cut Arrow transfer volume (filter/prune INSIDE the scan projection).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BOILERPLATE_KINDS = ("script", "style")


def spans_sorted(col="spans") -> Column:
    """O5 reading-order sort: array_sort by offset (struct comparison is
    field-ordered, so sorting by (kind,text,...) would be wrong — we
    rebuild structs keyed by offset first)."""
    return F.array_sort(
        F.transform(
            F.col(col) if isinstance(col, str) else col,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )


def drop_boilerplate_spans(col="spans") -> Column:
    """O1 as an expression: drop script/style spans before the kernel —
    less data through Arrow."""
    return F.filter(
        F.col(col) if isinstance(col, str) else col,
        lambda s: ~s["kind"].isin(*BOILERPLATE_KINDS),
    )


def span_kind_counts(col="spans") -> Column:
    """map<kind, count> summary of a span array (pure expression)."""
    c = F.col(col) if isinstance(col, str) else col
    kinds = F.array_distinct(F.transform(c, lambda s: s["kind"]))
    return F.map_from_arrays(
        kinds,
        F.transform(
            kinds, lambda k: F.size(F.filter(c, lambda s: s["kind"] == k))
        ),
    )


def text_payload(col="spans") -> Column:
    """Concatenated text of a span array in offset order (cheap JVM-side
    text view, e.g. for dedup over raw spans without running the kernel)."""
    return F.array_join(
        F.transform(spans_sorted(col), lambda s: s["text"]), " "
    )


def media_refs(col="spans") -> Column:
    """Distinct non-empty media references (image/link targets) of a doc."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_distinct(
        F.transform(
            F.filter(c, lambda s: (s["kind"].isin("image", "link")) & (s["media_ref"] != "")),
            lambda s: s["media_ref"],
        )
    )
