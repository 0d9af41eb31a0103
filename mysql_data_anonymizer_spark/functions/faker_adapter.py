"""Real-Faker adapter behind the engine's generator interface.

The reference's default generator is fzaninotto/Faker, locale-configurable
(reference src/Anonymizer.php:53-58, composer.json:11-15). The engine's
default replacement is hash-constructed ``DeterministicGenerator`` (SURVEY
§4.2 sanctions the divergence: Faker's process-global RNG is neither
distributable nor reproducible). This module rounds out parity by hosting
the *actual* Python ``faker`` library inside the pandas-UDF mask path when
it is installed:

  - one ``Faker(locale)`` instance per executor process per locale (the
    construction cost is amortized; reference keeps one per process too);
  - re-seeded **per row** from the row's md5 digest (seed ':' column
    ':faker' '|' pk), so every value is reproducible across runs, executor
    counts, and partitionings — the distributable form of Faker's
    ``seed_instance`` idiom.

``faker`` is optional (import-gated; it is not part of the engine's
dependency set). When absent, ``FallbackFaker`` supplies the same call
surface (``.name()``, ``.email()``, ``.city()``, ...) built from the
deterministic pick tables, so the adapter plumbing — instance cache,
per-row seeding, provider registration, stateful consecutive calls — is
identical and testable in any environment; only the value domain changes.
The fallback's values are pure md5 constructions, so masks using it stay
DuckDB-oracle-expressible (queries.py registers the oracle only when the
fallback is active — real-Faker values are genuinely non-SQL).

Usage::

    from mysql_data_anonymizer_spark.functions.faker_adapter import (
        register_faker_provider,
    )
    register_faker_provider()          # once, driver-side
    t.column("c_name").replaceWith(lambda g: g.faker.name())

The closure probe on the Column path raises (python-only provider), which
reroutes the mask to the pandas-UDF path where ``g.faker`` yields the
seeded backend (plans/compiler.py ``_COLUMN_INEXPRESSIBLE``).
"""

from __future__ import annotations

import hashlib

from mysql_data_anonymizer_spark.functions.generator import DOMAINS, HEX, LOCALES

try:  # optional dependency — the adapter works either way
    from faker import Faker as _RealFaker

    HAS_FAKER = True
except ImportError:  # pragma: no cover - depends on environment
    _RealFaker = None
    HAS_FAKER = False


class FallbackFaker:
    """Deterministic stand-in exposing Faker's *method* call surface.

    Consecutive calls of the same formatter advance an internal counter —
    mirroring Faker, where two ``fake.name()`` calls differ — and every
    value is ``md5(seed_material ':' method ':' counter)`` applied to the
    engine's pick tables, so an ANSI-SQL twin exists for oracle checks."""

    def __init__(self, locale: str = "en_US"):
        self.locale = locale
        self._t = LOCALES.get(locale, LOCALES["en_US"])
        self._material = ""
        self._calls: dict[str, int] = {}

    def seed_with(self, material: str) -> None:
        self._material = material
        self._calls = {}

    def _d(self, method: str) -> str:
        c = self._calls.get(method, 0)
        self._calls[method] = c + 1
        return hashlib.md5(f"{self._material}:{method}:{c}".encode("utf-8")).hexdigest()

    # -- Faker-compatible formatters (method calls, not properties) -------
    def name(self) -> str:
        d = self._d("name")
        return f"{self._t['first_names'][HEX.index(d[0])]} {self._t['last_names'][HEX.index(d[1])]}"

    def first_name(self) -> str:
        return self._t["first_names"][HEX.index(self._d("first_name")[0])]

    def last_name(self) -> str:
        return self._t["last_names"][HEX.index(self._d("last_name")[0])]

    def email(self) -> str:
        d = self._d("email")
        return f"user_{d[:10]}@{DOMAINS[HEX.index(d[10])]}"

    def city(self) -> str:
        return self._t["cities"][HEX.index(self._d("city")[0])]

    def company(self) -> str:
        d = self._d("company")
        return (
            f"{self._t['last_names'][HEX.index(d[0])]} "
            f"{self._t['company_suffixes'][HEX.index(d[1])]}"
        )

    def address(self) -> str:
        d = self._d("address")
        return f"{int(d[:3], 16) % 9999 + 1} {self._t['streets'][HEX.index(d[3])]}"

    def phone_number(self) -> str:
        return "+1-555-" + str(int(self._d("phone_number")[:8], 16) % 10000000).zfill(7)


class RealFakerBackend:
    """Thin wrapper giving the real library the same per-row seeding hook."""

    def __init__(self, locale: str = "en_US"):
        self._f = _RealFaker(locale)

    def seed_with(self, material: str) -> None:
        # 48 bits of the row digest — plenty for Faker's Mersenne seeding
        self._f.seed_instance(int(material[:12], 16))

    def __getattr__(self, name: str):
        return getattr(self._f, name)


# one backend per (executor process, locale) — construction is the
# expensive part (locale data load for real Faker); seeding is cheap
_instances: dict[str, FallbackFaker | RealFakerBackend] = {}


def faker_backend(locale: str = "en_US"):
    be = _instances.get(locale)
    if be is None:
        be = RealFakerBackend(locale) if HAS_FAKER else FallbackFaker(locale)
        _instances[locale] = be
    return be


def _column_probe(_gen):
    # python-only provider: raising here (a _COLUMN_INEXPRESSIBLE type)
    # tells the compiler to run the closure on the pandas-UDF path
    raise TypeError(
        "generator.faker hosts the python faker library and has no Column "
        "expression form; the mask closure reroutes to the pandas-UDF path"
    )


def _python_faker(py_gen):
    """Provider body on the pandas-UDF path: the cached backend, re-seeded
    from this row's digest. Valid for the current row only — closures must
    not stash it across rows (same contract as the reference's generator)."""
    be = faker_backend(py_gen.locale)
    be.seed_with(py_gen.digest(":faker"))
    return be


def register_faker_provider(name: str = "faker") -> None:
    """Make ``generator.<name>`` available in mask closures on the python
    path (reference custom-provider mechanism, src/Anonymizer.php:111-121)."""
    from mysql_data_anonymizer_spark.functions.registry import register_provider

    register_provider(name, _column_probe, _python_faker)
