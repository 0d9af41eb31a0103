"""Masking-plan IR — the engine's equivalent of the reference Blueprint.

The reference IR is the Blueprint object itself: an ordered list of column
specs ``{name, where, replace, replaceByFields}`` plus ``primary``,
``globalWhere`` and ``synchroColumns`` (reference src/Blueprint.php:19-61).
Here it is a frozen dataclass tree the compiler turns into Column
expressions; unlike the reference, the IR is validated against the DataFrame
schema before execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class SynchroTarget:
    """One referencing column to cascade key changes into.

    Mirrors ``synchronizeColumn([field, table, database])``
    (reference src/Blueprint.php:185-202). When ``database`` is set the
    remap targets a ``'database.table'`` registration, falling back to the
    bare table name (the reference default-fills the current database,
    src/Anonymizer.php:381-392).
    """

    field: str
    table: str
    database: str | None = None


@dataclass
class ColumnMask:
    """One column's masking spec (reference src/Blueprint.php:101-106).

    ``replace`` is one of:
      - a static value (str/int/float/...); a str may contain the ``#row#``
        placeholder (reference src/Anonymizer.php:236-243);
      - a ``pyspark.sql.Column`` expression (engine fast path);
      - a callable ``generator -> value`` (reference closure form,
        src/Anonymizer.php:250-261) — receives the deterministic generator
        bound to this row's primary key and may return a Column or a plain
        value;
    ``replace_by_fields`` is a callable ``(row: dict, generator) -> value``
    evaluated with earlier-declared masks already applied (position
    sensitivity, reference src/Anonymizer.php:345-371, README.md:81-87);
    runs as an Arrow-batched pandas UDF over a struct of all columns.
    ``where`` is a raw SQL guard compiled to ``when/otherwise``
    (reference src/Anonymizer.php:361-367).
    """

    name: str
    replace: Any = None
    replace_by_fields: Callable | None = None
    where: str | None = None
    unique: bool = False
    generator_formatter: str | None = None
    synchro: list[SynchroTarget] = field(default_factory=list)


@dataclass
class MaskingPlan:
    """Per-table plan: (table, primary key, global filter, ordered masks)."""

    table: str
    primary: list[str] = field(default_factory=lambda: ["id"])
    global_where: list[str] = field(default_factory=list)
    columns: list[ColumnMask] = field(default_factory=list)

    @property
    def global_where_sql(self) -> str | None:
        """Multiple globalWhere calls AND-combine (documented intent of
        reference README.md:58-60; the reference implementation is broken —
        see SURVEY §4.2 item 5)."""
        if not self.global_where:
            return None
        if len(self.global_where) == 1:
            return self.global_where[0]
        return " AND ".join(f"({w})" for w in self.global_where)

    def synchro_targets(self) -> list[tuple[str, SynchroTarget]]:
        """(source column, target) pairs for cross-table key propagation."""
        return [(c.name, t) for c in self.columns for t in c.synchro]

    def needs_row_number(self) -> bool:
        return any(
            isinstance(c.replace, str) and "#row#" in c.replace for c in self.columns
        )

    def validate(self, schema_fields: list[str]) -> None:
        """Name resolution the reference never does (SURVEY §3.2)."""
        fields = set(schema_fields)
        missing = [k for k in self.primary if k not in fields]
        missing += [c.name for c in self.columns if c.name not in fields]
        if missing:
            raise ValueError(
                f"plan for table {self.table!r} references unknown columns: {missing}"
            )
