"""Seeded deterministic value generators (SURVEY.md §2.1 G1-G12).

The reference generates values row-at-a-time with seedless
``random``/``Faker(tr_TR)`` (run_engine.py:45,155-203; fill_db.py:63-120).
Here every generator is a pure Column expression over a row-id column:

    value(row) = f(xxhash64(id, seed, salt))

which makes generation (a) a whole-stage-codegen'd projection instead of
a Python loop — the single biggest physical win over the reference
(SURVEY.md §4), and (b) bit-reproducible independent of partitioning
(``F.rand(seed)`` depends on partition layout; hash-of-id does not).

Locale-flavored providers (names, companies, cities — Faker tr_TR in the
reference) are lookup-array expressions over small broadcast word lists;
we match *shape* (type/length/charset), not Faker's exact strings
(SURVEY.md §7 hard-part 4). IBAN/phone match format, not checksums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- core uniform source ------------------------------------------------

_BUCKET = 1 << 30

# Literal-Column memo. Plan construction is driver-side Python whose cost
# is almost entirely py4j round trips; a Column literal is an immutable
# JVM expression object, so the SAME seed/salt/constant literal can be
# shared by every expression that mentions it (Catalyst copies nothing —
# trees reference nodes). An 85-table schema build repeats F.lit(seed)
# and small-int lits tens of thousands of times; memoizing them removed
# ~35% of the build's socket round trips (measured, see bench
# gen_full_schema). Process-wide on purpose: the py4j gateway (and thus
# the JVM objects) outlives individual SparkSessions.
_LIT_CACHE: dict[tuple[str, int | float | str], Column] = {}


def _lit(v: int | float | str) -> Column:
    key = (type(v).__name__, v)
    c = _LIT_CACHE.get(key)
    if c is None:
        c = _LIT_CACHE.setdefault(key, F.lit(v))
    return c


def unit_uniform(id_col: Column, seed: int, salt: str) -> Column:
    """Deterministic u ∈ [0, 1) from (row id, seed, salt)."""
    return F.pmod(F.xxhash64(id_col, _lit(seed), _lit(salt)), _lit(_BUCKET)) / _lit(float(_BUCKET))


def _h(id_col: Column, seed: int, salt: str, k: int = 0) -> Column:
    """Deterministic non-negative 64-bit hash stream element."""
    return F.pmod(F.xxhash64(id_col, _lit(seed), _lit(salt), _lit(k)), _lit(1 << 62))


# --- scalar generators (G1-G7, G12) ------------------------------------


def gen_uuid(id_col: Column, seed: int, salt: str) -> Column:
    """Deterministic UUID-shaped string (G1; run_engine.py:161,194).

    md5 of the (id, seed, salt) key formatted 8-4-4-4-12. Spark's
    built-in ``uuid()`` is nondeterministic — unusable for reproducible
    runs, which are a deliberate improvement over the reference."""
    hx = F.md5(F.concat_ws("-", id_col.cast("string"), _lit(str(seed)), _lit(salt)))
    return F.concat_ws(
        "-",
        F.substring(hx, 1, 8),
        F.substring(hx, 9, 4),
        F.substring(hx, 13, 4),
        F.substring(hx, 17, 4),
        F.substring(hx, 21, 12),
    )


def gen_int(id_col: Column, seed: int, salt: str, lo: int, hi: int) -> Column:
    """Uniform integer in [lo, hi] (G2; run_engine.py:180-182)."""
    return (_lit(lo) + F.pmod(_h(id_col, seed, salt), _lit(hi - lo + 1))).cast("int")


def gen_long(id_col: Column, seed: int, salt: str, lo: int, hi: int) -> Column:
    return (_lit(lo) + F.pmod(_h(id_col, seed, salt), _lit(hi - lo + 1))).cast("long")


def gen_bool(id_col: Column, seed: int, salt: str) -> Column:
    """Bernoulli(0.5) (G3; run_engine.py:178)."""
    return (F.pmod(_h(id_col, seed, salt), _lit(2)) == 0).cast("boolean")


def gen_decimal(id_col: Column, seed: int, salt: str, precision: int, scale: int) -> Column:
    """Bounded decimal (G4; run_engine.py:184-188): uniform in
    [0, min(10^(p-s)-1, 10000)] rounded to scale — the reference's exact
    bounding rule."""
    limit = min(10 ** (precision - scale) - 1, 10000)
    u = unit_uniform(id_col, seed, salt)
    return F.round(u * _lit(float(limit)), scale).cast(f"decimal({precision},{scale})")


def gen_double(id_col: Column, seed: int, salt: str, lo: float = 10.0, hi: float = 50000.0, digits: int = 2) -> Column:
    """pyfloat rule analogue (data_rules.json: right_digits=2, positive)."""
    u = unit_uniform(id_col, seed, salt)
    return F.round(_lit(lo) + u * _lit(hi - lo), digits)


def gen_timestamp(id_col: Column, seed: int, salt: str, anchor: str = "2026-01-01 00:00:00") -> Column:
    """Timestamp in the year before `anchor` (G5-analogue; reference uses
    nondeterministic now(), run_engine.py:190-191 — we pin an anchor)."""
    secs = F.pmod(_h(id_col, seed, salt), _lit(365 * 24 * 3600))
    return F.timestamp_seconds(F.unix_timestamp(_lit(anchor).cast("timestamp")) - secs)


def gen_date(id_col: Column, seed: int, salt: str, anchor: str = "2026-01-01", days_back: int = 3650) -> Column:
    """date_this_decade analogue (G6; fill_db.py:82-83)."""
    return F.date_sub(_lit(anchor).cast("date"), F.pmod(_h(id_col, seed, salt), _lit(days_back)).cast("int"))


def gen_numerify(id_col: Column, seed: int, salt: str, n_digits: int) -> Column:
    """Fixed-width digit string (G7; run_engine.py:51-53): first digit
    nonzero, e.g. TCKN=11, VKN=10 digits."""
    first = (_lit(1) + F.pmod(_h(id_col, seed, salt, 1), _lit(9))).cast("string")
    if n_digits == 1:
        return first
    rest = F.lpad(
        F.pmod(_h(id_col, seed, salt, 2), _lit(10 ** (n_digits - 1))).cast("string"),
        n_digits - 1,
        "0",
    )
    return F.concat(first, rest)


def gen_code(id_col: Column, seed: int, salt: str, prefix: str = "AUTO") -> Column:
    """'AUTO-####' pattern (G12; run_engine.py:73)."""
    return F.format_string(f"{prefix}-%04d", (_lit(1000) + F.pmod(_h(id_col, seed, salt), _lit(9000))).cast("int"))


def gen_lexify(id_col: Column, seed: int, salt: str, n_chars: int = 4) -> Column:
    """n random lowercase letters (lexify('????'), run_engine.py:201-203)."""
    parts = [
        F.char(_lit(97) + F.pmod(_h(id_col, seed, salt, k), _lit(26)).cast("int"))
        for k in range(n_chars)
    ]
    return F.concat(*parts)


# --- lookup-array providers (G8-G11) -----------------------------------
# Public-knowledge word lists, written for shape parity with Faker tr_TR
# output (type/length/charset) — not copies of Faker data.

FIRST_NAMES = ["Ahmet", "Mehmet", "Ayse", "Fatma", "Ali", "Mustafa", "Zeynep", "Emre", "Elif", "Can",
               "Deniz", "Cem", "Selin", "Burak", "Merve", "Kerem", "Esra", "Murat", "Seda", "Okan"]
LAST_NAMES = ["Yilmaz", "Kaya", "Demir", "Celik", "Sahin", "Ozturk", "Aydin", "Arslan", "Dogan", "Kilic",
              "Aslan", "Cetin", "Kara", "Koc", "Kurt", "Ozdemir", "Erdogan", "Polat", "Aksoy", "Tekin"]
COMPANY_SUFFIXES = ["A.S.", "Ltd. Sti.", "Holding", "Ticaret", "Sanayi", "Grup"]
CITIES = ["Istanbul", "Ankara", "Izmir", "Bursa", "Antalya", "Adana", "Konya", "Gaziantep",
          "Mersin", "Kayseri", "Eskisehir", "Samsun", "Denizli", "Trabzon", "Malatya", "Erzurum"]
COUNTRIES = ["Turkiye", "Germany", "France", "Italy", "Spain", "Netherlands", "United Kingdom",
             "United States", "Japan", "China", "Brazil", "India", "Canada", "Poland", "Greece"]
STREET_WORDS = ["Cadde", "Sokak", "Bulvar", "Mahalle", "Meydan"]
DOMAINS = ["example.com", "example.org", "example.net", "mail.example.com", "test.example.org"]
WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "lambda", "sigma", "omega",
         "kuzey", "guney", "dogu", "bati", "merkez", "yeni", "eski", "buyuk", "kucuk", "hizli",
         "mavi", "yesil", "kirmizi", "beyaz", "siyah", "demir", "bakir", "celik", "cam", "ahsap"]
ADJECTIVES = ["Premium", "Standart", "Ekonomik", "Profesyonel", "Endustriyel", "Klasik", "Modern", "Dayanikli"]
NOUNS = ["Vida", "Kablo", "Panel", "Motor", "Filtre", "Rulman", "Sensor", "Vana", "Profil", "Boru"]


# Lexicon arrays are memoized as ONE parsed array(...) expression each —
# the per-element F.lit form cost len(items)+1 round trips per provider
# call and dominated wide-table plan construction (measured).
_ARR_CACHE: dict[tuple[str, ...], Column] = {}


def _arr(items: list[str]) -> Column:
    key = tuple(items)
    c = _ARR_CACHE.get(key)
    if c is None:
        sql = "array(" + ",".join("'" + w.replace("'", "''") + "'" for w in items) + ")"
        c = _ARR_CACHE.setdefault(key, F.expr(sql))
    return c


def _pick(id_col: Column, seed: int, salt: str, items: list[str], k: int = 0) -> Column:
    return F.element_at(_arr(items), (F.pmod(_h(id_col, seed, salt, k), _lit(len(items))) + 1).cast("int"))


def gen_first_name(id_col: Column, seed: int, salt: str) -> Column:
    return _pick(id_col, seed, salt, FIRST_NAMES)


def gen_last_name(id_col: Column, seed: int, salt: str) -> Column:
    return _pick(id_col, seed, salt, LAST_NAMES, k=1)


def gen_full_name(id_col: Column, seed: int, salt: str) -> Column:
    return F.concat_ws(" ", gen_first_name(id_col, seed, salt), gen_last_name(id_col, seed, salt))


def gen_company(id_col: Column, seed: int, salt: str) -> Column:
    """'<Word> <Word> A.S.' — company-name shape (run_engine.py:62)."""
    return F.concat_ws(
        " ",
        F.initcap(_pick(id_col, seed, salt, WORDS, k=2)),
        F.initcap(_pick(id_col, seed, salt, WORDS, k=3)),
        _pick(id_col, seed, salt, COMPANY_SUFFIXES, k=4),
    )


def gen_email(id_col: Column, seed: int, salt: str) -> Column:
    """Deterministic composition (G8): first.last<n>@domain."""
    return F.lower(
        F.concat(
            gen_first_name(id_col, seed, salt),
            _lit("."),
            gen_last_name(id_col, seed, salt),
            F.pmod(_h(id_col, seed, salt, 5), _lit(100)).cast("string"),
            _lit("@"),
            _pick(id_col, seed, salt, DOMAINS, k=6),
        )
    )


def gen_phone(id_col: Column, seed: int, salt: str) -> Column:
    """'+90 5## ### ## ##' Turkish-mobile shape."""
    return F.format_string(
        "+90 5%02d %03d %02d %02d",
        F.pmod(_h(id_col, seed, salt, 1), _lit(100)).cast("int"),
        F.pmod(_h(id_col, seed, salt, 2), _lit(1000)).cast("int"),
        F.pmod(_h(id_col, seed, salt, 3), _lit(100)).cast("int"),
        F.pmod(_h(id_col, seed, salt, 4), _lit(100)).cast("int"),
    )


def _digit(id_col: Column, seed: int, salt: str, k: int) -> Column:
    """One uniform decimal digit as an int column."""
    return F.pmod(_h(id_col, seed, salt, 100 + k), _lit(10)).cast("int")


def gen_iban(id_col: Column, seed: int, salt: str) -> Column:
    """Valid Turkish IBAN: TR + mod-97 check digits + 22-digit BBAN.

    The check is computed expression-side by folding (acc·10 + digit) mod
    97 over the 28-digit rearranged number (BBAN ++ 'TR00' → ...292700) —
    ISO 7064. Stronger than the reference, whose Faker output is valid
    but nondeterministic; ours is valid AND reproducible."""
    bban = [_digit(id_col, seed, salt, k) for k in range(22)]
    acc: Column = _lit(0)
    for d in bban + [_lit(2), _lit(9), _lit(2), _lit(7), _lit(0), _lit(0)]:
        acc = F.pmod(acc * 10 + d, _lit(97))
    check = _lit(98) - acc
    return F.concat(
        _lit("TR"),
        F.lpad(check.cast("string"), 2, "0"),
        F.concat(*[d.cast("string") for d in bban]),
    )


def gen_ean13(id_col: Column, seed: int, salt: str) -> Column:
    """Valid EAN-13 barcode: 12 data digits + standard check digit
    (odd positions weight 1, even weight 3, mod 10)."""
    digits = [_digit(id_col, seed, salt, k) for k in range(12)]
    wsum = sum(d * (1 if i % 2 == 0 else 3) for i, d in enumerate(digits))
    check = F.pmod(_lit(10) - F.pmod(wsum, _lit(10)), _lit(10))
    return F.concat(*[d.cast("string") for d in digits + [check]])


def gen_address(id_col: Column, seed: int, salt: str) -> Column:
    return F.concat_ws(
        " ",
        F.initcap(_pick(id_col, seed, salt, WORDS, k=7)),
        _pick(id_col, seed, salt, STREET_WORDS, k=8),
        F.concat(_lit("No:"), (F.pmod(_h(id_col, seed, salt, 9), _lit(200)) + 1).cast("string")),
        _pick(id_col, seed, salt, CITIES, k=10),
    )


def gen_city(id_col: Column, seed: int, salt: str) -> Column:
    return _pick(id_col, seed, salt, CITIES)


def gen_country(id_col: Column, seed: int, salt: str) -> Column:
    return _pick(id_col, seed, salt, COUNTRIES)


def gen_url(id_col: Column, seed: int, salt: str) -> Column:
    return F.concat(_lit("https://www."), _pick(id_col, seed, salt, DOMAINS), _lit("/"))


def gen_word(id_col: Column, seed: int, salt: str) -> Column:
    """Title-cased single word (run_engine.py:201-202)."""
    return F.initcap(_pick(id_col, seed, salt, WORDS))


def gen_sentence(id_col: Column, seed: int, salt: str, n_words: int = 10) -> Column:
    """n-word sentence (G10; fake.sentence(nb_words), run_engine.py:68)."""
    words = [_pick(id_col, seed, salt, WORDS, k=20 + k) for k in range(n_words)]
    return F.concat(F.initcap(words[0]), _lit(" "), F.concat_ws(" ", *words[1:]), _lit("."))


def gen_product_name(id_col: Column, seed: int, salt: str) -> Column:
    """adjective + noun composition (G11; run_engine.py:71-72)."""
    return F.concat_ws(" ", _pick(id_col, seed, salt, ADJECTIVES, k=1), _pick(id_col, seed, salt, NOUNS, k=2))
