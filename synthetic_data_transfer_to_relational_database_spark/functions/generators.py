"""Seeded deterministic value generators (SURVEY.md §2.1 G1-G12).

The reference generates values row-at-a-time with seedless
``random``/``Faker(tr_TR)`` (run_engine.py:45,155-203; fill_db.py:63-120).
Here every generator is a pure expression over a row-id column:

    value(row) = f(xxhash64(id, seed, salt))

which makes generation (a) a whole-stage-codegen'd projection instead of
a Python loop — the single biggest physical win over the reference
(SURVEY.md §4), and (b) bit-reproducible independent of partitioning
(``F.rand(seed)`` depends on partition layout; hash-of-id does not).

Generators build **SQL text**, not Column objects. Classic-PySpark
Column composition costs one py4j socket round trip per ``F.*`` call (and
per ``_lit``): an 85-table schema build spent ~50% of its wall clock in
~240k such round trips (profiled, r9). Rendering each column's whole
expression as one SQL string and parsing it once with ``F.expr`` is O(1)
round trips per COLUMN instead of per NODE — the same fix already
applied to array literals (plans/executor._array_literal); this completes
it for the generator layer. The caller (plans/compiler.compile_rule →
plans/executor) wraps the final string in ``F.expr(...).alias(...)``.

Literal rendering must reproduce the exact types classic ``F.lit`` would
have produced — ``xxhash64`` output (and hence every generated value)
depends on argument TYPES, not just values: Python int → INT when it
fits int32 else BIGINT (``123`` / ``123L``); float → DOUBLE via
``CAST('repr' AS DOUBLE)`` (a bare SQL ``1.5`` is DECIMAL, which would
change every hash downstream). Strings render single-quoted; a value
containing a quote or backslash has NO quoting that parses identically
under both the default and legacy (``escapedStringLiterals``) parsers,
so it is carried as ``CAST(unbase64('..') AS STRING)`` — base64 text is
quote-free, and constant folding collapses it to the same string literal
either way.

Locale-flavored providers (names, companies, cities — Faker tr_TR in the
reference) are lookup-array expressions over small word lists; we match
*shape* (type/length/charset), not Faker's exact strings (SURVEY.md §7
hard-part 4). IBAN/phone match format, not checksums.
"""

from __future__ import annotations

import base64

# --- core uniform source ------------------------------------------------

_BUCKET = 1 << 30

_INT32_MIN, _INT32_MAX = -(1 << 31), (1 << 31) - 1


def _qi(v: int) -> str:
    """Integer literal typed exactly as classic ``F.lit(v)``: INT when it
    fits int32, else BIGINT."""
    return str(v) if _INT32_MIN <= v <= _INT32_MAX else f"{v}L"


def _qd(v: float) -> str:
    """Double literal. A bare SQL ``1.5`` parses as DECIMAL(2,1) — the
    CAST-from-repr form is the established exact-double rendering
    (plans/executor._array_literal)."""
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"CAST({v!r} AS DOUBLE)"


def _qs(s: str) -> str:
    """String literal that parses identically under both parser modes."""
    if "'" in s or "\\" in s:
        b64 = base64.b64encode(s.encode("utf-8")).decode("ascii")
        return f"CAST(unbase64('{b64}') AS STRING)"
    return f"'{s}'"


def unit_uniform(id_sql: str, seed: int, salt: str) -> str:
    """Deterministic u ∈ [0, 1) from (row id, seed, salt)."""
    return (
        f"(pmod(xxhash64({id_sql}, {_qi(seed)}, {_qs(salt)}), {_qi(_BUCKET)})"
        f" / {_qd(float(_BUCKET))})"
    )


def _h(id_sql: str, seed: int, salt: str, k: int = 0) -> str:
    """Deterministic non-negative 64-bit hash stream element."""
    return (
        f"pmod(xxhash64({id_sql}, {_qi(seed)}, {_qs(salt)}, {_qi(k)}),"
        f" {_qi(1 << 62)})"
    )


# --- scalar generators (G1-G7, G12) ------------------------------------


def gen_uuid(id_sql: str, seed: int, salt: str) -> str:
    """Deterministic UUID-shaped string (G1; run_engine.py:161,194).

    md5 of the (id, seed, salt) key formatted 8-4-4-4-12. Spark's
    built-in ``uuid()`` is nondeterministic — unusable for reproducible
    runs, which are a deliberate improvement over the reference."""
    hx = (
        f"md5(concat_ws('-', CAST({id_sql} AS STRING),"
        f" {_qs(str(seed))}, {_qs(salt)}))"
    )
    return (
        f"concat_ws('-', substring({hx}, 1, 8), substring({hx}, 9, 4),"
        f" substring({hx}, 13, 4), substring({hx}, 17, 4),"
        f" substring({hx}, 21, 12))"
    )


def gen_int(id_sql: str, seed: int, salt: str, lo: int, hi: int) -> str:
    """Uniform integer in [lo, hi] (G2; run_engine.py:180-182)."""
    return (
        f"CAST(({_qi(lo)} + pmod({_h(id_sql, seed, salt)},"
        f" {_qi(hi - lo + 1)})) AS INT)"
    )


def gen_long(id_sql: str, seed: int, salt: str, lo: int, hi: int) -> str:
    return (
        f"CAST(({_qi(lo)} + pmod({_h(id_sql, seed, salt)},"
        f" {_qi(hi - lo + 1)})) AS BIGINT)"
    )


def gen_bool(id_sql: str, seed: int, salt: str) -> str:
    """Bernoulli(0.5) (G3; run_engine.py:178)."""
    return f"CAST((pmod({_h(id_sql, seed, salt)}, 2) = 0) AS BOOLEAN)"


def gen_decimal(id_sql: str, seed: int, salt: str, precision: int, scale: int) -> str:
    """Bounded decimal (G4; run_engine.py:184-188): uniform in
    [0, min(10^(p-s)-1, 10000)] rounded to scale — the reference's exact
    bounding rule."""
    limit = min(10 ** (precision - scale) - 1, 10000)
    u = unit_uniform(id_sql, seed, salt)
    return (
        f"CAST(round(({u} * {_qd(float(limit))}), {scale})"
        f" AS DECIMAL({precision},{scale}))"
    )


def gen_double(
    id_sql: str, seed: int, salt: str, lo: float = 10.0, hi: float = 50000.0, digits: int = 2
) -> str:
    """pyfloat rule analogue (data_rules.json: right_digits=2, positive)."""
    u = unit_uniform(id_sql, seed, salt)
    return f"round(({_qd(lo)} + ({u} * {_qd(hi - lo)})), {digits})"


def gen_timestamp(
    id_sql: str, seed: int, salt: str, anchor: str = "2026-01-01 00:00:00"
) -> str:
    """Timestamp in the year before `anchor` (G5-analogue; reference uses
    nondeterministic now(), run_engine.py:190-191 — we pin an anchor)."""
    secs = f"pmod({_h(id_sql, seed, salt)}, {_qi(365 * 24 * 3600)})"
    return (
        f"timestamp_seconds((unix_timestamp(CAST({_qs(anchor)} AS TIMESTAMP))"
        f" - {secs}))"
    )


def gen_date(
    id_sql: str, seed: int, salt: str, anchor: str = "2026-01-01", days_back: int = 3650
) -> str:
    """date_this_decade analogue (G6; fill_db.py:82-83)."""
    return (
        f"date_sub(CAST({_qs(anchor)} AS DATE),"
        f" CAST(pmod({_h(id_sql, seed, salt)}, {_qi(days_back)}) AS INT))"
    )


def gen_numerify(id_sql: str, seed: int, salt: str, n_digits: int) -> str:
    """Fixed-width digit string (G7; run_engine.py:51-53): first digit
    nonzero, e.g. TCKN=11, VKN=10 digits."""
    first = f"CAST((1 + pmod({_h(id_sql, seed, salt, 1)}, 9)) AS STRING)"
    if n_digits == 1:
        return first
    rest = (
        f"lpad(CAST(pmod({_h(id_sql, seed, salt, 2)},"
        f" {_qi(10 ** (n_digits - 1))}) AS STRING), {n_digits - 1}, '0')"
    )
    return f"concat({first}, {rest})"


def gen_code(id_sql: str, seed: int, salt: str, prefix: str = "AUTO") -> str:
    """'AUTO-####' pattern (G12; run_engine.py:73)."""
    return (
        f"format_string({_qs(prefix + '-%04d')},"
        f" CAST((1000 + pmod({_h(id_sql, seed, salt)}, 9000)) AS INT))"
    )


def gen_lexify(id_sql: str, seed: int, salt: str, n_chars: int = 4) -> str:
    """n random lowercase letters (lexify('????'), run_engine.py:201-203)."""
    parts = [
        f"char((97 + CAST(pmod({_h(id_sql, seed, salt, k)}, 26) AS INT)))"
        for k in range(n_chars)
    ]
    return f"concat({', '.join(parts)})"


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

# Lexicon arrays render once per process — the text is identical every
# call, but the join is pure-Python and worth skipping in wide builds.
_ARR_CACHE: dict[tuple[str, ...], str] = {}


def _arr(items: list[str]) -> str:
    key = tuple(items)
    c = _ARR_CACHE.get(key)
    if c is None:
        c = _ARR_CACHE.setdefault(
            key, "array(" + ",".join(_qs(w) for w in items) + ")"
        )
    return c


def _pick(id_sql: str, seed: int, salt: str, items: list[str], k: int = 0) -> str:
    return (
        f"element_at({_arr(items)},"
        f" CAST((pmod({_h(id_sql, seed, salt, k)}, {_qi(len(items))}) + 1) AS INT))"
    )


def gen_first_name(id_sql: str, seed: int, salt: str) -> str:
    return _pick(id_sql, seed, salt, FIRST_NAMES)


def gen_last_name(id_sql: str, seed: int, salt: str) -> str:
    return _pick(id_sql, seed, salt, LAST_NAMES, k=1)


def gen_full_name(id_sql: str, seed: int, salt: str) -> str:
    return (
        f"concat_ws(' ', {gen_first_name(id_sql, seed, salt)},"
        f" {gen_last_name(id_sql, seed, salt)})"
    )


def gen_company(id_sql: str, seed: int, salt: str) -> str:
    """'<Word> <Word> A.S.' — company-name shape (run_engine.py:62)."""
    return (
        f"concat_ws(' ', initcap({_pick(id_sql, seed, salt, WORDS, k=2)}),"
        f" initcap({_pick(id_sql, seed, salt, WORDS, k=3)}),"
        f" {_pick(id_sql, seed, salt, COMPANY_SUFFIXES, k=4)})"
    )


def gen_email(id_sql: str, seed: int, salt: str) -> str:
    """Deterministic composition (G8): first.last<n>@domain."""
    return (
        f"lower(concat({gen_first_name(id_sql, seed, salt)}, '.',"
        f" {gen_last_name(id_sql, seed, salt)},"
        f" CAST(pmod({_h(id_sql, seed, salt, 5)}, 100) AS STRING), '@',"
        f" {_pick(id_sql, seed, salt, DOMAINS, k=6)}))"
    )


def gen_phone(id_sql: str, seed: int, salt: str) -> str:
    """'+90 5## ### ## ##' Turkish-mobile shape."""
    return (
        "format_string('+90 5%02d %03d %02d %02d', "
        f"CAST(pmod({_h(id_sql, seed, salt, 1)}, 100) AS INT), "
        f"CAST(pmod({_h(id_sql, seed, salt, 2)}, 1000) AS INT), "
        f"CAST(pmod({_h(id_sql, seed, salt, 3)}, 100) AS INT), "
        f"CAST(pmod({_h(id_sql, seed, salt, 4)}, 100) AS INT))"
    )


def _digit(id_sql: str, seed: int, salt: str, k: int) -> str:
    """One uniform decimal digit as an int expression."""
    return f"CAST(pmod({_h(id_sql, seed, salt, 100 + k)}, 10) AS INT)"


def gen_iban(id_sql: str, seed: int, salt: str) -> str:
    """Valid Turkish IBAN: TR + mod-97 check digits + 22-digit BBAN.

    The check is computed expression-side by folding (acc·10 + digit) mod
    97 over the 28-digit rearranged number (BBAN ++ 'TR00' → ...292700) —
    ISO 7064. Stronger than the reference, whose Faker output is valid
    but nondeterministic; ours is valid AND reproducible."""
    bban = [_digit(id_sql, seed, salt, k) for k in range(22)]
    acc = "0"
    for d in bban + ["2", "9", "2", "7", "0", "0"]:
        acc = f"pmod((({acc} * 10) + {d}), 97)"
    check = f"(98 - {acc})"
    return (
        f"concat('TR', lpad(CAST({check} AS STRING), 2, '0'), "
        + "concat(" + ", ".join(f"CAST({d} AS STRING)" for d in bban) + "))"
    )


def gen_ean13(id_sql: str, seed: int, salt: str) -> str:
    """Valid EAN-13 barcode: 12 data digits + standard check digit
    (odd positions weight 1, even weight 3, mod 10)."""
    digits = [_digit(id_sql, seed, salt, k) for k in range(12)]
    wsum = "0"
    for i, d in enumerate(digits):
        wsum = f"({wsum} + ({d} * {1 if i % 2 == 0 else 3}))"
    check = f"pmod((10 - pmod({wsum}, 10)), 10)"
    return (
        "concat("
        + ", ".join(f"CAST({d} AS STRING)" for d in digits + [check])
        + ")"
    )


def gen_address(id_sql: str, seed: int, salt: str) -> str:
    return (
        f"concat_ws(' ', initcap({_pick(id_sql, seed, salt, WORDS, k=7)}),"
        f" {_pick(id_sql, seed, salt, STREET_WORDS, k=8)},"
        f" concat('No:', CAST((pmod({_h(id_sql, seed, salt, 9)}, 200) + 1)"
        f" AS STRING)),"
        f" {_pick(id_sql, seed, salt, CITIES, k=10)})"
    )


def gen_city(id_sql: str, seed: int, salt: str) -> str:
    return _pick(id_sql, seed, salt, CITIES)


def gen_country(id_sql: str, seed: int, salt: str) -> str:
    return _pick(id_sql, seed, salt, COUNTRIES)


def gen_url(id_sql: str, seed: int, salt: str) -> str:
    return f"concat('https://www.', {_pick(id_sql, seed, salt, DOMAINS)}, '/')"


def gen_word(id_sql: str, seed: int, salt: str) -> str:
    """Title-cased single word (run_engine.py:201-202)."""
    return f"initcap({_pick(id_sql, seed, salt, WORDS)})"


def gen_sentence(id_sql: str, seed: int, salt: str, n_words: int = 10) -> str:
    """n-word sentence (G10; fake.sentence(nb_words), run_engine.py:68)."""
    words = [_pick(id_sql, seed, salt, WORDS, k=20 + k) for k in range(n_words)]
    return (
        f"concat(initcap({words[0]}), ' ',"
        f" concat_ws(' '{''.join(', ' + w for w in words[1:])}), '.')"
    )


def gen_product_name(id_sql: str, seed: int, salt: str) -> str:
    """adjective + noun composition (G11; run_engine.py:71-72)."""
    return (
        f"concat_ws(' ', {_pick(id_sql, seed, salt, ADJECTIVES, k=1)},"
        f" {_pick(id_sql, seed, salt, NOUNS, k=2)})"
    )
