"""Fluent masking DSL — API parity with the reference Blueprint.

Reference surface (src/Blueprint.php:99-248):
    table->primary(key)                 # str or list; default ['id']
    table->globalWhere(rawSql)          # multiple calls AND-combine
    table->column(name)
         ->where(rawSql)
         ->replaceWith(value|closure)   # '#row#' templating supported
         ->replaceWithGenerator(fmt, unique=False)
         ->replaceByFields(closure)     # (row, generator) -> value
         ->synchronizeColumn([field, table, database?])

Like the reference (src/Blueprint.php:223-234), the user callback runs
immediately and mutates the IR; unlike the reference, the result is a typed
``MaskingPlan`` validated against the DataFrame schema before execution.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

from mysql_data_anonymizer_spark.plans.plan import ColumnMask, MaskingPlan, SynchroTarget


class Blueprint:
    #: class-level default primary key, applied when a blueprint never calls
    #: ``primary()`` — reference ``Blueprint::setDefaultPrimary``
    #: (src/Blueprint.php:87-90, consumed in build() :223-234)
    _default_primary: list[str] = ["id"]

    def __init__(self, table: str, callback: Callable[["Blueprint"], None] | None = None):
        self.plan = MaskingPlan(table=table, primary=list(self._default_primary))
        self._current: ColumnMask | None = None
        if callback is not None:
            callback(self)

    # -- table-level ------------------------------------------------------
    @classmethod
    def setDefaultPrimary(cls, key: str | Iterable[str]) -> None:
        """Set the primary key every subsequent Blueprint starts with
        (reference src/Blueprint.php:87-90). Per-blueprint ``primary()``
        still overrides."""
        cls._default_primary = [key] if isinstance(key, str) else list(key)

    def primary(self, key: str | Iterable[str]) -> "Blueprint":
        self.plan.primary = [key] if isinstance(key, str) else list(key)
        return self

    def globalWhere(self, raw_sql: str) -> "Blueprint":
        self.plan.global_where.append(raw_sql)
        return self

    # -- column chain -----------------------------------------------------
    def column(self, name: str) -> "Blueprint":
        """Start a new column spec; finalized by a replace* call
        (reference src/Blueprint.php:99-109)."""
        self._current = ColumnMask(name=name)
        return self

    def where(self, raw_sql: str) -> "Blueprint":
        self._require_current("where")
        self._current.where = raw_sql
        return self

    def replaceWith(self, value: Any) -> "Blueprint":
        """Static value (str may contain '#row#'), Column expression, or
        closure ``generator -> value``."""
        self._require_current("replaceWith")
        self._current.replace = value
        self._append_current()
        return self

    def replaceWithGenerator(self, formatter: str, unique: bool = False) -> "Blueprint":
        """Sugar for generator-driven masks (reference src/Blueprint.php:163-176)."""
        self._require_current("replaceWithGenerator")
        self._current.generator_formatter = formatter
        self._current.unique = unique
        self._append_current()
        return self

    def replaceByFields(self, fn: Callable) -> "Blueprint":
        """Row-derived mask ``(row: dict, generator) -> value``; sees
        earlier-declared masks already applied (reference README.md:81-87)."""
        self._require_current("replaceByFields")
        self._current.replace_by_fields = fn
        self._append_current()
        return self

    def synchronizeColumn(
        self, target: Iterable[str] | SynchroTarget, *more: Iterable[str] | SynchroTarget
    ) -> "Blueprint":
        """Cascade this column's old->new values into referencing columns
        (reference src/Blueprint.php:185-202). Accepts ``[field, table]`` or
        ``[field, table, database]`` per target."""
        mask = self._current or (self.plan.columns[-1] if self.plan.columns else None)
        if mask is None:
            raise ValueError("synchronizeColumn() requires a preceding column()")
        for t in (target, *more):
            if not isinstance(t, SynchroTarget):
                t = SynchroTarget(*list(t))
            mask.synchro.append(t)
        return self

    # -- internals --------------------------------------------------------
    def _require_current(self, method: str) -> None:
        if self._current is None:
            raise ValueError(f"{method}() requires a preceding column() call")

    def _append_current(self) -> None:
        if self._current is not None and all(c is not self._current for c in self.plan.columns):
            self.plan.columns.append(self._current)
