"""Deterministic fake-data generators.

The reference delegates fake values to fzaninotto/Faker closures evaluated
client-side once per row (reference src/Anonymizer.php:53-58, 250-261), with
``unique()`` doing retry-until-distinct on process-global state
(reference src/Blueprint.php:165-168) — neither distributable nor
reproducible. This engine replaces that with **hash-based construction**:

    value = formatter(md5(seed ':' salt '|' primary_key))

which is (a) embarrassingly parallel, (b) reproducible across runs and
cluster sizes, (c) unique by construction when the pk is embedded in the
value, and (d) expressible both as a Spark ``Column`` (JVM-side, codegen'd)
and as ANSI SQL for the DuckDB oracle.

``DeterministicGenerator`` builds Column expressions (the hot path — no
Python in the loop). ``PyRowGenerator`` computes the *same* values with
hashlib for arbitrary user closures running inside a pandas UDF; both paths
hash-agree, so a closure mask and an expression mask are interchangeable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"

# 16-entry pick tables (size 16 => one hex digit indexes them, which keeps
# the DuckDB-oracle SQL a single strpos() expression). Locale-keyed — the
# reference's generator is locale-configurable Faker
# (reference src/Anonymizer.php:53-55, config/config-sample.php:8).
LOCALES: dict[str, dict[str, list[str]]] = {
    "en_US": {
        "first_names": [
            "alice", "bruno", "carla", "david", "elena", "felix", "grace", "hugo",
            "irene", "jonas", "karim", "laura", "mateo", "nadia", "oscar", "paula",
        ],
        "last_names": [
            "smith", "garcia", "mueller", "rossi", "tanaka", "kumar", "chen", "silva",
            "novak", "dubois", "haram", "olsen", "papas", "quinn", "reyes", "sato",
        ],
        "streets": [
            "oak st", "elm ave", "pine rd", "maple dr", "cedar ln", "birch way",
            "walnut ct", "ash blvd", "spruce pl", "willow ter", "poplar row",
            "laurel pass", "hazel loop", "alder gate", "rowan path", "linden sq",
        ],
        "cities": [
            "springfield", "riverton", "fairview", "kingston", "ashland", "dover",
            "milton", "clayton", "burlington", "salem", "georgetown", "arlington",
            "bristol", "clinton", "dayton", "easton",
        ],
        "company_suffixes": [
            "llc", "inc", "corp", "ltd", "co", "group", "holdings", "partners",
            "labs", "works", "systems", "industries", "ventures", "solutions",
            "enterprises", "associates",
        ],
    },
    "de_DE": {
        "first_names": [
            "anna", "bernd", "clara", "dieter", "erika", "franz", "greta", "heinz",
            "ingrid", "juergen", "katrin", "lukas", "monika", "niklas", "otto", "petra",
        ],
        "last_names": [
            "mueller", "schmidt", "schneider", "fischer", "weber", "meyer", "wagner",
            "becker", "schulz", "hoffmann", "koch", "bauer", "richter", "klein",
            "wolf", "schroeder",
        ],
        "streets": [
            "hauptstrasse", "schulstrasse", "gartenweg", "bahnhofstrasse",
            "dorfstrasse", "bergweg", "lindenallee", "waldweg", "ringstrasse",
            "am markt", "kirchgasse", "muehlenweg", "rosenweg", "amselweg",
            "finkenweg", "eichenallee",
        ],
        "cities": [
            "neustadt", "altdorf", "gruenberg", "rotenburg", "lindau", "buchholz",
            "steinfurt", "wiesental", "falkensee", "birkenau", "eberbach",
            "hohenfels", "mittenwald", "oberdorf", "unterberg", "westheim",
        ],
        "company_suffixes": [
            "gmbh", "ag", "kg", "ohg", "gbr", "ug", "se", "ev",
            "gruppe", "werke", "systeme", "technik", "handel", "bau",
            "logistik", "service",
        ],
    },
    "fr_FR": {
        "first_names": [
            "amelie", "bastien", "chloe", "damien", "elise", "fabien", "gaelle",
            "henri", "ines", "julien", "karine", "lucas", "manon", "nicolas",
            "oceane", "pierre",
        ],
        "last_names": [
            "martin", "bernard", "dubois", "thomas", "robert", "richard", "petit",
            "durand", "leroy", "moreau", "simon", "laurent", "lefebvre", "michel",
            "garcia", "david",
        ],
        "streets": [
            "rue de la paix", "rue victor hugo", "avenue des champs", "rue du moulin",
            "place de l'eglise", "rue des ecoles", "chemin des vignes", "rue pasteur",
            "avenue de la gare", "rue des lilas", "impasse des roses", "rue du stade",
            "boulevard carnot", "rue jean jaures", "allee des tilleuls", "rue du port",
        ],
        "cities": [
            "villeneuve", "montclair", "beaulieu", "rochefort", "clairmont",
            "fontenay", "valmont", "pierrefonds", "grandville", "belleville",
            "chateauneuf", "sablons", "verneuil", "aubervault", "roseraie",
            "saint-loup",
        ],
        "company_suffixes": [
            "sarl", "sa", "sas", "eurl", "sci", "snc", "scop", "groupe",
            "et fils", "freres", "industries", "services", "conseil", "atelier",
            "maison", "compagnie",
        ],
    },
}

# backwards-compatible en_US aliases (used by existing oracles/tests)
FIRST_NAMES = LOCALES["en_US"]["first_names"]
LAST_NAMES = LOCALES["en_US"]["last_names"]
STREETS = LOCALES["en_US"]["streets"]
DOMAINS = [
    "example.com", "example.org", "example.net", "mail.test", "post.test",
    "corp.test", "web.test", "data.test", "acme.test", "globo.test",
    "umbra.test", "vertex.test", "nimbus.test", "quartz.test", "zephyr.test",
    "onyx.test",
]

# date_of_birth anchor/span: dob = DOB_BASE - (18*365 + n % (72*365)) days,
# identical arithmetic in the Column, Python, and SQL twins
DOB_BASE = "2008-01-01"
DOB_MIN_YEARS = 18
DOB_SPAN_DAYS = 72 * 365


def _digest_col(seed: int, salt: str, key: Column) -> Column:
    return F.md5(F.concat(F.lit(f"{seed}:{salt}|"), key.cast("string")))


def _hex_val(d: Column, pos: int) -> Column:
    """Value 0..15 of the hex digit at 1-based ``pos`` of digest ``d``."""
    return F.instr(F.lit(HEX), F.substring(d, pos, 1)) - F.lit(1)


class DeterministicGenerator:
    """Column-expression fake-data generator bound to a row-key expression.

    Mask closures receive an instance of this class (the engine's analogue
    of the reference's ``$generator``) and call formatters; each formatter
    returns a ``pyspark.sql.Column``. ``unique()`` returns a view whose
    formatters embed the primary key into the value, giving global
    uniqueness without coordination.
    """

    # custom formatters added via functions.registry.register_provider
    _providers: dict = {}

    def __init__(
        self,
        seed: int,
        key: Column,
        column: str,
        unique: bool = False,
        locale: str = "en_US",
    ):
        self.seed = seed
        self.key = key
        self.column = column  # salt: distinct masked columns get distinct values
        self._unique = unique
        self.locale = locale
        self._t = LOCALES.get(locale, LOCALES["en_US"])

    def __getattr__(self, name: str):
        providers = type(self)._providers
        if name in providers:
            return providers[name](self)
        raise AttributeError(
            f"generator has no formatter {name!r} (register custom providers "
            f"via functions.registry.register_provider)"
        )

    # -- plumbing ---------------------------------------------------------
    def unique(self) -> "DeterministicGenerator":
        return DeterministicGenerator(
            self.seed, self.key, self.column, unique=True, locale=self.locale
        )

    def digest(self, extra_salt: str = "") -> Column:
        return _digest_col(self.seed, f"{self.column}{extra_salt}", self.key)

    def _key_part(self) -> Column:
        return self.key.cast("string")

    # -- formatters -------------------------------------------------------
    @property
    def email(self) -> Column:
        d = self.digest()
        local = F.concat(F.lit("user_"), F.substring(d, 1, 10))
        if self._unique:
            local = F.concat(local, F.lit("."), self._key_part())
        domain = _pick(DOMAINS, _hex_val(d, 11))
        return F.concat(local, F.lit("@"), domain)

    @property
    def name(self) -> Column:
        d = self.digest()
        out = F.concat(
            _pick(self._t["first_names"], _hex_val(d, 1)),
            F.lit(" "),
            _pick(self._t["last_names"], _hex_val(d, 2)),
        )
        if self._unique:
            out = F.concat(out, F.lit(" "), self._key_part())
        return out

    @property
    def first_name(self) -> Column:
        return _pick(self._t["first_names"], _hex_val(self.digest(), 1))

    @property
    def last_name(self) -> Column:
        return _pick(self._t["last_names"], _hex_val(self.digest(), 2))

    @property
    def city(self) -> Column:
        return _pick(self._t["cities"], _hex_val(self.digest(), 5))

    @property
    def company(self) -> Column:
        d = self.digest()
        return F.concat(
            _pick(self._t["last_names"], _hex_val(d, 3)),
            F.lit(" "),
            _pick(self._t["company_suffixes"], _hex_val(d, 4)),
        )

    @property
    def date_of_birth(self) -> Column:
        """Date in [DOB_BASE - 90y, DOB_BASE - 18y) — same offset arithmetic
        as the Python/SQL twins."""
        d = self.digest()
        off = _hex_int(d, 1, 8) % F.lit(DOB_SPAN_DAYS) + F.lit(DOB_MIN_YEARS * 365)
        return F.date_sub(F.lit(DOB_BASE).cast("date"), off.cast("int"))

    @property
    def ipv4(self) -> Column:
        """Deterministic 10.x.y.z private-range address (one hex pair per
        octet)."""
        d = self.digest()
        octets = [
            (_hex_val(d, p) * F.lit(16) + _hex_val(d, p + 1)).cast("string")
            for p in (1, 3, 5)
        ]
        return F.concat_ws(".", F.lit("10"), *octets)

    @property
    def credit_card_number(self) -> Column:
        """Luhn-valid 16-digit number: '4' + 14 digest digits + check digit
        (same construction in the Python twin)."""
        d = self.digest()
        digits = [F.lit(4)] + [(_hex_val(d, p) % F.lit(10)) for p in range(1, 15)]
        # Luhn: with the check digit at position 16 (from the left), digits
        # at odd positions i (1-based from the left) are doubled
        total: Column = F.lit(0)
        for i, dig in enumerate(digits, start=1):
            if i % 2 == 1:
                dbl = dig * F.lit(2)
                total = total + F.when(dbl > 9, dbl - F.lit(9)).otherwise(dbl)
            else:
                total = total + dig
        check = (F.lit(10) - total % F.lit(10)) % F.lit(10)
        return F.concat(*[dig.cast("string") for dig in digits], check.cast("string"))

    @property
    def uuid(self) -> Column:
        d = self.digest()
        if self._unique:
            # splice the pk hash in so distinct keys can't collide even on
            # a (vanishingly unlikely) md5 collision of the salted digest
            d = F.md5(F.concat(d, self._key_part()))
        return F.concat_ws(
            "-",
            F.substring(d, 1, 8),
            F.substring(d, 9, 4),
            F.substring(d, 13, 4),
            F.substring(d, 17, 4),
            F.substring(d, 21, 12),
        )

    @property
    def phone_number(self) -> Column:
        d = self.digest()
        n = _hex_int(d, 1, 8)  # 0 .. 16^8-1
        return F.concat(F.lit("+1-555-"), F.lpad((n % F.lit(10000000)).cast("string"), 7, "0"))

    @property
    def address(self) -> Column:
        d = self.digest()
        num = (_hex_int(d, 1, 3) % F.lit(9999) + F.lit(1)).cast("string")
        return F.concat(num, F.lit(" "), _pick(self._t["streets"], _hex_val(d, 4)))

    def number_between(self, lo: int, hi: int) -> Column:
        """Uniform-ish integer in [lo, hi]."""
        d = self.digest(f":nb:{lo}:{hi}")
        return (_hex_int(d, 1, 8) % F.lit(hi - lo + 1) + F.lit(lo)).cast("long")

    def random_element(self, choices: list) -> Column:
        d = self.digest(f":re:{len(choices)}")
        idx = _hex_int(d, 1, 4) % F.lit(len(choices))
        return F.element_at(F.array(*[F.lit(c) for c in choices]), idx.cast("int") + F.lit(1))

    def hex_token(self, length: int = 16) -> Column:
        return F.substring(self.digest(f":tok:{length}"), 1, length)


def _pick(table: list[str], idx: Column) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in table]), idx.cast("int") + F.lit(1))


def _hex_int(d: Column, pos: int, ndigits: int) -> Column:
    """Integer value of digest hex digits [pos, pos+ndigits) — built from
    per-digit strpos arithmetic so the same formula is writable in the
    DuckDB oracle (no conv() dependency)."""
    # accumulate in long: 8 hex digits overflow int32 under ANSI mode
    out = F.lit(0).cast("long")
    for i in range(ndigits):
        out = out * F.lit(16) + _hex_val(d, pos + i).cast("long")
    return out


class PyRowGenerator:
    """Python twin of ``DeterministicGenerator`` for arbitrary user closures
    running inside a pandas UDF (the reference's client-side closure path,
    src/Anonymizer.php:250-261). Same md5 construction => identical values.
    """

    # python twins of custom formatters (functions.registry.register_provider)
    _providers: dict = {}

    def __init__(
        self, seed: int, key: str, column: str, unique: bool = False, locale: str = "en_US"
    ):
        self.seed = seed
        self.key = str(key)
        self.column = column
        self._unique = unique
        self.locale = locale
        self._t = LOCALES.get(locale, LOCALES["en_US"])
        self._dcache: dict[str, str] = {}

    def __getattr__(self, name: str):
        providers = type(self)._providers
        if name in providers:
            return providers[name](self)
        raise AttributeError(f"generator has no formatter {name!r}")

    def unique(self) -> "PyRowGenerator":
        return PyRowGenerator(
            self.seed, self.key, self.column, unique=True, locale=self.locale
        )

    def digest(self, extra_salt: str = "") -> str:
        # memoized: closures touching several formatters (name + email + ...)
        # share the default-salt digest instead of re-hashing per access
        d = self._dcache.get(extra_salt)
        if d is None:
            raw = f"{self.seed}:{self.column}{extra_salt}|{self.key}"
            d = hashlib.md5(raw.encode("utf-8")).hexdigest()
            self._dcache[extra_salt] = d
        return d

    @property
    def email(self) -> str:
        d = self.digest()
        local = "user_" + d[:10]
        if self._unique:
            local += "." + self.key
        return f"{local}@{DOMAINS[HEX.index(d[10])]}"

    @property
    def name(self) -> str:
        d = self.digest()
        out = f"{self._t['first_names'][HEX.index(d[0])]} {self._t['last_names'][HEX.index(d[1])]}"
        if self._unique:
            out += " " + self.key
        return out

    @property
    def first_name(self) -> str:
        return self._t["first_names"][HEX.index(self.digest()[0])]

    @property
    def last_name(self) -> str:
        return self._t["last_names"][HEX.index(self.digest()[1])]

    @property
    def city(self) -> str:
        return self._t["cities"][HEX.index(self.digest()[4])]

    @property
    def company(self) -> str:
        d = self.digest()
        return f"{self._t['last_names'][HEX.index(d[2])]} {self._t['company_suffixes'][HEX.index(d[3])]}"

    @property
    def date_of_birth(self):
        import datetime

        d = self.digest()
        off = int(d[:8], 16) % DOB_SPAN_DAYS + DOB_MIN_YEARS * 365
        base = datetime.date.fromisoformat(DOB_BASE)
        return base - datetime.timedelta(days=off)

    @property
    def ipv4(self) -> str:
        d = self.digest()
        return "10." + ".".join(str(int(d[p : p + 2], 16)) for p in (0, 2, 4))

    @property
    def credit_card_number(self) -> str:
        d = self.digest()
        digits = [4] + [HEX.index(c) % 10 for c in d[:14]]
        total = 0
        for i, dig in enumerate(digits, start=1):
            if i % 2 == 1:
                dbl = dig * 2
                total += dbl - 9 if dbl > 9 else dbl
            else:
                total += dig
        check = (10 - total % 10) % 10
        return "".join(map(str, digits)) + str(check)

    @property
    def uuid(self) -> str:
        d = self.digest()
        if self._unique:
            d = hashlib.md5((d + self.key).encode("utf-8")).hexdigest()
        return f"{d[0:8]}-{d[8:12]}-{d[12:16]}-{d[16:20]}-{d[20:32]}"

    @property
    def phone_number(self) -> str:
        n = int(self.digest()[:8], 16)
        return "+1-555-" + str(n % 10000000).zfill(7)

    @property
    def address(self) -> str:
        d = self.digest()
        return f"{int(d[:3], 16) % 9999 + 1} {self._t['streets'][HEX.index(d[3])]}"

    def number_between(self, lo: int, hi: int) -> int:
        d = self.digest(f":nb:{lo}:{hi}")
        return int(d[:8], 16) % (hi - lo + 1) + lo

    def random_element(self, choices: list):
        d = self.digest(f":re:{len(choices)}")
        return choices[int(d[:4], 16) % len(choices)]

    def hex_token(self, length: int = 16) -> str:
        return self.digest(f":tok:{length}")[:length]
