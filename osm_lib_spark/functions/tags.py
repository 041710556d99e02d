"""Tag-list column functions.

Reference semantics: tags are an ORDERED list of (key, value) pairs,
not a map — duplicates allowed, equality is list equality, lookup is
first-match linear scan (reference OSMEntity.java:16,40-48,104-109).
We therefore model tags as ``array<struct<key:string,value:string>>``
everywhere and never convert to ``map``.

All functions here are pure Column expressions (JVM-side, whole-stage
codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TAG_SCHEMA = "array<struct<key:string,value:string>>"

# Values Java's tagIsTrue/tagIsFalse accept (reference OSMEntity.java:62-70).
_TRUE_VALUES = ("yes", "true", "1")
_FALSE_VALUES = ("no", "false", "0")


def parse_tags(tag_str: Column) -> Column:
    """Parse ``"k=v;k=v;"`` into an ordered tag array.

    Mirrors setTagsFromString (reference OSMEntity.java:73-82): split on
    ';', drop empty segments, split each on '=' with limit 2; a segment
    without '=' yields value '' (the reference Tag ctor coerces null→"",
    OSMEntity.java:20-23).
    """
    pairs = F.filter(F.split(tag_str, ";"), lambda p: p != F.lit(""))
    return F.transform(
        pairs,
        lambda p: F.struct(
            F.get(F.split(p, "=", 2), 0).alias("key"),
            F.coalesce(F.get(F.split(p, "=", 2), 1), F.lit("")).alias("value"),
        ),
    )


def render_tags(tags: Column) -> Column:
    """Render a tag array back to ``"k=v;k=v;"`` (trailing ';').

    Mirrors Tag.toString + TextOutput tag rendering (reference
    OSMEntity.java:26-28, TextOutput.java:24-34). Empty/null → ''.
    """
    rendered = F.array_join(
        F.transform(tags, lambda t: F.concat(t["key"], F.lit("="), t["value"])), ";"
    )
    return F.when(
        tags.isNull() | (F.size(tags) == 0), F.lit("")
    ).otherwise(F.concat(rendered, F.lit(";")))


def get_tag(tags: Column, key: str) -> Column:
    """First-match tag lookup; NULL when absent (OSMEntity.java:40-48)."""
    matches = F.filter(tags, lambda t: t["key"] == F.lit(key))
    return F.when(F.size(matches) > 0, F.element_at(matches, 1)["value"])


def has_tag(tags: Column, key: str, value: str | None = None) -> Column:
    """Existence predicate, optionally on (key, value) (OSMEntity.java:50-56)."""
    if value is None:
        return F.exists(tags, lambda t: t["key"] == F.lit(key))
    return F.exists(
        tags, lambda t: (t["key"] == F.lit(key)) & (t["value"] == F.lit(value))
    )


def tag_is_true(tags: Column, key: str) -> Column:
    """First-match value ∈ {yes,true,1}, case-insensitive (OSMEntity.java:62-65)."""
    return F.lower(get_tag(tags, key)).isin(*_TRUE_VALUES)


def tag_is_false(tags: Column, key: str) -> Column:
    """First-match value ∈ {no,false,0}, case-insensitive (OSMEntity.java:67-70)."""
    return F.lower(get_tag(tags, key)).isin(*_FALSE_VALUES)


def has_no_tags(tags: Column) -> Column:
    """Null-or-empty test (OSMEntity.java:58-60)."""
    return tags.isNull() | (F.size(tags) == 0)


def retain_keys(tags: Column, keys: list[str]) -> Column:
    """Keep only tags whose key is in the allowlist (PBFInput.java:42-59)."""
    arr = F.array(*[F.lit(k) for k in keys])
    return F.filter(tags, lambda t: F.array_contains(arr, t["key"]))


def add_or_replace_tag(tags: Column, key: str, value) -> Column:
    """Upsert by case-insensitive key, else append (OSMEntity.java:91-102).

    The reference replaces the value of the FIRST case-insensitive key
    match in place (preserving position) or appends a new tag.
    ``value`` may be a Column (per-row values — the SpeedSetter.java
    CSV-driven flow) or a literal string.
    """
    k = F.lit(key)
    v = value if isinstance(value, Column) else F.lit(value)
    exists = F.exists(tags, lambda t: F.lower(t["key"]) == F.lower(k))
    # Replace only the first match: compare each position with the index
    # of the first case-insensitive match.
    lowered = F.transform(tags, lambda t: F.lower(t["key"]))
    first_idx = F.array_position(lowered, F.lower(k))  # 1-based, 0 if absent
    replaced = F.zip_with(
        tags,
        F.sequence(F.lit(1), F.size(tags)),
        lambda t, i: F.when(
            i == first_idx, F.struct(t["key"].alias("key"), v.alias("value"))
        ).otherwise(t),
    )
    appended = F.concat(
        F.coalesce(tags, F.array().cast(TAG_SCHEMA)),
        F.array(F.struct(k.alias("key"), v.alias("value"))),
    )
    return F.when(exists, replaced).otherwise(appended)
