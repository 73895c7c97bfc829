"""Trigram language-ID classifier (functions/text.py LANG_PROFILES)."""

from pyspark.sql import functions as F

from quickstart_streaming_agents_spark.functions.text import lang_id_ngram

SENTENCES = [
    ("en", "the quick brown fox jumped over the lazy dog and went to the river"),
    ("en", "this is an example of an english sentence that should be classified"),
    ("es", "el perro corre por la calle y que la casa de mi amigo es grande"),
    ("es", "una historia sobre los pueblos de la región y por qué se fueron"),
    ("de", "der hund und die katze sind in dem garten und sie spielen zusammen"),
    ("de", "ich habe das buch gelesen und es war sehr schön und interessant"),
    ("fr", "le chien et le chat sont dans le jardin pour jouer avec les enfants"),
    ("fr", "une petite histoire que nous avons lue dans le livre de la classe"),
    ("und", "zzz qqq 12345 @@@@"),
    ("und", ""),
]


def test_lang_id_ngram_classifies_common_sentences(spark):
    df = spark.createDataFrame(SENTENCES, ["expected", "text"])
    rows = df.select("expected", lang_id_ngram("text").alias("got")).collect()
    wrong = [(r.expected, r.got) for r in rows if r.expected != r.got]
    assert not wrong, f"misclassified: {wrong}"


def test_lang_id_ngram_null_safe(spark):
    df = spark.createDataFrame([(1, None)], "id INT, text STRING")
    assert df.select(lang_id_ngram("text").alias("l")).first().l == "und"


def test_lang_scores_are_exact_integers(spark):
    from quickstart_streaming_agents_spark.functions.text import lang_score

    df = spark.createDataFrame([("the the the",)], ["text"])
    row = df.select(lang_score("text", "en").alias("s")).first()
    # " the the the " → " th"(5)+"the"(5)+"he "(5) per occurrence ×3 = 45,
    # plus overlap trigrams "e t"(0)… — only profile hits count
    assert isinstance(row.s, int) and row.s == 45


def test_accented_spanish_trigrams_reachable(spark):
    """The Spanish profile's weighted 'ció'/'ión' trigrams must fire —
    the old [^a-z ] cleaning deleted every accented letter."""
    from quickstart_streaming_agents_spark.functions.text import lang_id_ngram

    df = spark.createDataFrame(
        [(1, "la información de la nación y la situación actual")],
        "id long, text string",
    )
    row = df.select(lang_id_ngram("text").alias("lang")).first()
    assert row.lang == "es"


def test_punct_ratio_ignores_accented_letters(spark):
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.functions.text import punct_ratio

    df = spark.createDataFrame([("El niño comió en el jardín",)], "t string")
    assert df.select(punct_ratio("t").alias("p")).first().p == 0.0


def test_phone_redaction_standard_formats(spark):
    from quickstart_streaming_agents_spark.functions.text import pii_redact

    df = spark.createDataFrame(
        [("call +1-555-123-4567 or +15551234567 or 555-123-4567 now",)],
        "t string",
    )
    out = df.select(pii_redact("t").alias("r")).first().r
    assert out == "call <PHONE> or <PHONE> or <PHONE> now"


def test_url_canonicalize_rules(spark):
    """Each canonicalization rule in isolation + the ones that must NOT
    fire: non-tracking query params survive, the root-path slash stays,
    path case is preserved, non-default ports are preserved."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.functions.text import (
        url_canonicalize,
    )

    cases = {
        "HTTP://WWW.Ex.COM:80/A/B/": "http://ex.com/A/B",
        "https://ex.com/page?utm_source=x&q=1": "https://ex.com/page?q=1",
        "https://ex.com/page?q=1&utm_medium=y": "https://ex.com/page?q=1",
        "https://ex.com/page?utm_only=z": "https://ex.com/page",
        "https://ex.com/#frag": "https://ex.com/",   # root slash stays
        "https://ex.com:8080/a": "https://ex.com:8080/a",  # real port kept
        "https://ex.com/CaseSensitive/Path": "https://ex.com/CaseSensitive/Path",
        "https://ex.com:443/x#y": "https://ex.com/x",
        # params merely CONTAINING utm_ are NOT tracking params
        "https://ex.com/p?autumn_utm_x=1": "https://ex.com/p?autumn_utm_x=1",
        "https://ex.com/p?a=1&my_utm_y=3&b=2": "https://ex.com/p?a=1&my_utm_y=3&b=2",
        # consecutive utm params all drop; survivors keep their order
        "https://ex.com/p?utm_a=1&utm_b=2&q=3": "https://ex.com/p?q=3",
        "https://ex.com/p?utm_a=1&utm_b=2": "https://ex.com/p",
        "https://ex.com/p?q=1&utm_a=2&r=3": "https://ex.com/p?q=1&r=3",
        # default ports are scheme-conditional: http on :443 is a
        # DIFFERENT endpoint, never merged with the https page
        "http://ex.com:443/a": "http://ex.com:443/a",
        "https://ex.com:80/a": "https://ex.com:80/a",
        # dangling separators (left by strips OR in the raw URL) drop,
        # so these merge with their clean forms
        "https://ex.com/p?utm_a=1&": "https://ex.com/p",
        "https://ex.com/p?a=1&utm_b=2&": "https://ex.com/p?a=1",
        "https://ex.com/p?a=1&": "https://ex.com/p?a=1",
        "https://ex.com/p?": "https://ex.com/p",
    }
    df = spark.createDataFrame(
        [(u,) for u in cases], ["url"]
    ).select("url", url_canonicalize(F.col("url")).alias("c"))
    got = {r.url: r.c for r in df.collect()}
    for u, want in cases.items():
        assert got[u] == want, (u, got[u], want)


def test_url_canonicalize_idempotent_over_combinatorial_urls(spark):
    """Canonicalization must be a projection: applying it twice equals
    applying it once, over a combinatorial grid of scheme/www/port/path/
    params/fragment variants (a non-idempotent rule would mean the
    'canonical' key depends on how many times a pipeline cleaned it)."""
    from pyspark.sql import functions as F

    from quickstart_streaming_agents_spark.functions.text import (
        url_canonicalize,
    )

    urls = []
    for scheme in ("http://", "HTTPS://"):
        for www in ("", "www.", "WWW."):
            for port in ("", ":80", ":443", ":8080"):
                for path in ("", "/", "/A/b", "/A/b/"):
                    for q in ("", "?q=1", "?utm_a=1", "?q=1&utm_b=2&",
                              "?utm_a=1&utm_b=2&q=3"):
                        for frag in ("", "#x"):
                            urls.append(
                                f"{scheme}{www}Ex.COM{port}{path}{q}{frag}"
                            )
    df = spark.createDataFrame([(u,) for u in urls], ["url"]).select(
        "url",
        url_canonicalize(F.col("url")).alias("c1"),
    ).select("url", "c1", url_canonicalize(F.col("c1")).alias("c2"))
    bad = [(r.url, r.c1, r.c2) for r in df.collect() if r.c1 != r.c2]
    assert not bad, bad[:5]
    assert len(urls) == 2 * 3 * 4 * 4 * 5 * 2


def test_script_counts_and_dominant(spark):
    """Per-block codepoint counts are exact, the argmax tie-break is
    alphabetical, empty/no-script text maps to 'none', and mixed text
    counts each block independently."""
    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.functions.text import (
        dominant_script,
        script_counts,
    )

    rows = [
        Row(doc_id=1, t="hello world"),                  # latin only
        Row(doc_id=2, t="中文数据中文"),                   # cjk only
        Row(doc_id=3, t="абв xyz"),                      # tie 3 vs 3
        Row(doc_id=4, t="12345 !!"),                     # none
        Row(doc_id=5, t="mix 中 к α ع"),                  # one of each
        Row(doc_id=6, t="カタカナ"),                       # kana counts as cjk
    ]
    df = spark.createDataFrame(rows)
    counts = script_counts("t")
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            *[counts[n].alias(n) for n in sorted(counts)],
            dominant_script("t").alias("dom"),
        ).collect()
    }
    assert got[1].latin == 10 and got[1].dom == "latin"
    assert got[2].cjk == 6 and got[2].dom == "cjk"
    # cyrillic vs latin tie at 3: alphabetical order wins -> cyrillic
    assert got[3].cyrillic == 3 and got[3].latin == 3
    assert got[3].dom == "cyrillic"
    assert got[4].dom == "none"
    assert (got[5].arabic, got[5].cjk, got[5].cyrillic, got[5].greek) == (
        1, 1, 1, 1,
    )
    assert got[5].dom == "latin"  # 'mix' = 3 latin chars beats the 1s
    assert got[6].cjk == 4 and got[6].dom == "cjk"


def test_luhn_validation_matches_independent_implementation(spark):
    """The JVM Luhn fold must agree with a hand-rolled Python Luhn on
    valid/bumped/random digit strings, and the audit must separate
    candidates from valid cards across formats and decoys."""
    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.functions.text import (
        credit_card_audit,
        luhn_valid,
    )

    def luhn_py(s: str) -> bool:
        tot = 0
        for i, ch in enumerate(reversed(s), 1):
            d = int(ch)
            if i % 2 == 0:
                d = d * 2 - 9 if d * 2 > 9 else d * 2
            tot += d
        return tot % 10 == 0

    import random

    rng = random.Random(9)
    cases = ["4111111111111111", "5500005555555559", "378282246310005",
             "6011000990139424", "1234567890123"]
    cases += ["".join(rng.choice("0123456789") for _ in range(n))
              for n in (13, 15, 16, 19) for _ in range(10)]
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(cases)])
    got = {r.i: r.ok for r in df.select(
        "i", luhn_valid(F.col("s")).alias("ok")).collect()}
    for i, s in enumerate(cases):
        assert got[i] == luhn_py(s), s

    rows = [
        Row(doc_id=1, text="pay 4111 1111 1111 1111 now"),   # grouped valid
        Row(doc_id=2, text="ref 4111111111111112"),          # bumped digit
        Row(doc_id=3, text="order 12345678 and ip 10.0.0.1"),  # no candidate
        Row(doc_id=4, text="amex 378282246310005 + visa 4111111111111111"),
    ]
    a = credit_card_audit("text")
    df2 = spark.createDataFrame(rows).select(
        "doc_id", a["cc_candidates"].alias("n"),
        a["cc_valid"].alias("v"), a["cc_last4"].alias("l4"),
    )
    got2 = {r.doc_id: (r.n, r.v, r.l4) for r in df2.collect()}
    assert got2[1] == (1, 1, "1111")
    assert got2[2] == (1, 0, None)
    assert got2[3] == (0, 0, None)
    assert got2[4] == (2, 2, "0005")  # first valid card's last4


def test_credit_card_audit_covers_17_to_19_digit_pans(spark):
    """ADVICE r10: 19-digit Visa/Maestro/UnionPay PANs (grouped
    4-4-4-4-3 or solid) must become candidates — the old 4+4+4+{1,4}
    pattern capped at 16 digits, so the 13-19 length filter's upper
    range was unreachable. 20-digit runs stay out (past the filter)."""
    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.functions.text import (
        credit_card_audit,
    )

    def with_check_digit(base: str) -> str:
        for cd in "0123456789":
            s = base + cd
            tot = 0
            for i, ch in enumerate(reversed(s), 1):
                d = int(ch)
                if i % 2 == 0:
                    d = d * 2 - 9 if d * 2 > 9 else d * 2
                tot += d
            if tot % 10 == 0:
                return s
        raise AssertionError("unreachable")

    pan19 = with_check_digit("626200000000000000")   # UnionPay-range
    grouped = " ".join([pan19[0:4], pan19[4:8], pan19[8:12],
                        pan19[12:16], pan19[16:19]])
    bumped = pan19[:-1] + str((int(pan19[-1]) + 1) % 10)
    rows = [
        Row(doc_id=1, text=f"card {pan19} end"),         # solid 19, valid
        Row(doc_id=2, text=f"card {grouped} end"),       # grouped 19, valid
        Row(doc_id=3, text=f"ref {bumped}"),             # 19, fails Luhn
        Row(doc_id=4, text=f"id {pan19}0"),              # 20 digits: not a PAN
    ]
    a = credit_card_audit("text")
    df = spark.createDataFrame(rows).select(
        "doc_id", a["cc_candidates"].alias("n"),
        a["cc_valid"].alias("v"), a["cc_last4"].alias("l4"),
    )
    got = {r.doc_id: (r.n, r.v, r.l4) for r in df.collect()}
    assert got[1] == (1, 1, pan19[-4:])
    assert got[2] == (1, 1, pan19[-4:])
    assert got[3] == (1, 0, None)
    assert got[4] == (0, 0, None)


def test_html_text_extract_contracts(spark):
    """C4 boilerplate strip: script/style/comment subtrees drop (even
    when a JS string contains a '<p>' decoy), block closers break words
    apart, entities decode exactly once (&amp;lt; must NOT double-decode
    to '<'), whitespace collapses."""
    from quickstart_streaming_agents_spark.functions.text import (
        html_text_extract,
    )

    cases = [
        # script body with tag decoy inside a JS string stays dropped
        ('<script>var x = "<p>decoy</p>";</script><p>keep</p>', "keep"),
        # style subtree's text is code, not content
        ("<style>p{color:red}</style><b>bold</b> text", "bold text"),
        # comment spanning lines drops; tail text survives
        ("<!-- multi\nline -->tail", "tail"),
        # block closers become breaks so words don't glue
        ("<p>one</p><p>two</p>", "one two"),
        # inline closers strip without a break (no space inserted)
        ("<b>gl</b>ued", "glued"),
        # entities decode once: '&amp;lt;' is literal '&lt;' not '<'
        ("a &amp;lt; b &gt; c &quot;d&quot; &#39;e&#39;", 'a &lt; b > c "d" \'e\''),
        # whitespace collapse + trim
        ("  <p> spaced   out </p>  ", "spaced out"),
        # case-insensitive tags
        ("<SCRIPT>gone()</SCRIPT><P>Hi</P>", "Hi"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], ["i", "html"]
    )
    got = {r.i: r.t for r in
           df.select("i", html_text_extract("html").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i])


def test_iban_validation_matches_independent_implementation(spark):
    """The streaming-modular-reduction fold must agree with Python's
    arbitrary-precision int() % 97 on valid/bumped/random IBANs, and
    the audit must separate candidates from valid accounts."""
    import random
    import string

    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.functions.text import (
        iban_audit,
        iban_valid,
    )

    def iban_py(s: str) -> bool:
        r = s[4:] + s[:4]
        digits = "".join(
            str(ord(ch) - 55) if ch.isalpha() else ch for ch in r
        )
        return int(digits) % 97 == 1

    rng = random.Random(4)
    cases = ["DE89370400440532013000", "GB29NWBK60161331926819",
             "FR1420041010050500013M02606", "NL91ABNA0417164300",
             "DE90370400440532013000"]  # bumped: invalid
    cases += [
        "XY" + "".join(rng.choice(string.digits) for _ in range(2))
        + "".join(rng.choice(string.ascii_uppercase + string.digits)
                  for _ in range(rng.randint(11, 30)))
        for _ in range(40)
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)],
                               ["i", "s"])
    got = {r.i: bool(r.ok) for r in
           df.select("i", iban_valid(F.col("s")).alias("ok")).collect()}
    for i, s in enumerate(cases):
        assert got[i] == iban_py(s), s

    rows = [
        Row(doc_id=1, text="pay DE89 3704 0044 0532 0130 00 now"),
        Row(doc_id=2, text="acct DE90370400440532013000"),   # bumped
        Row(doc_id=3, text="order 12345678 plain text"),     # no candidate
        Row(doc_id=4, text="NL91ABNA0417164300 or GB29NWBK60161331926819"),
    ]
    a = iban_audit("text")
    df2 = spark.createDataFrame(rows).select(
        "doc_id", a["iban_candidates"].alias("n"),
        a["iban_valid"].alias("v"), a["iban_country"].alias("cc"),
    )
    got2 = {r.doc_id: (r.n, r.v, r.cc) for r in df2.collect()}
    assert got2[1] == (1, 1, "DE")
    assert got2[2] == (1, 0, None)
    assert got2[3] == (0, 0, None)
    assert got2[4] == (2, 2, "NL")


def test_mojibake_repair_contracts(spark):
    """Latin-1 AND cp1252 (WHATWG mapping) mojibake both repair exactly;
    marker-bearing byte-invalid text is detected but left alone; real
    accented French and plain ASCII never fire; one repair pass undoes
    one layer of double encoding."""
    from quickstart_streaming_agents_spark.functions.text import (
        mojibake_repair,
    )

    def whatwg1252(data: bytes) -> str:
        return "".join(
            chr(b) if b in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
            else bytes([b]).decode("cp1252")
            for b in data
        )

    target = "“déjà vu” — naïve café"
    single = whatwg1252(target.encode("utf-8"))
    double = whatwg1252(single.encode("utf-8"))
    cases = [
        (1, "café".encode("utf-8").decode("latin-1"), True, True, "café"),
        (2, single, True, True, target),
        (3, "Ã© ok but Ã_ bad", True, False, "Ã© ok but Ã_ bad"),
        (4, "plain ascii only", False, False, "plain ascii only"),
        (5, "français déjà là", False, False, "français déjà là"),
        (6, double, True, True, single),  # one pass peels one layer
    ]
    df = spark.createDataFrame([(i, s) for i, s, *_ in cases], ["i", "s"])
    m = mojibake_repair("s")
    got = {r.i: (r.d, r.r, r.o) for r in df.select(
        "i", m["mojibake_detected"].alias("d"),
        m["repaired"].alias("r"), m["text_out"].alias("o")).collect()}
    for i, _s, want_d, want_r, want_o in cases:
        assert got[i] == (want_d, want_r, want_o), (i, got[i])
    # composing the repair twice fully undoes double encoding
    m1 = mojibake_repair("s")
    df2 = df.select("i", m1["text_out"].alias("once"))
    m2 = mojibake_repair("once")
    row = {r.i: r.o for r in df2.select(
        "i", m2["text_out"].alias("o")).collect()}
    assert row[6] == target


def test_pii_pseudonymize_contracts(spark):
    """Valid PANs rewrite to deterministic surrogates (same PAN -> same
    surrogate, layout + last4 preserved); Luhn-invalid lookalikes are
    untouched; the surrogate digits match an independent md5-based
    derivation."""
    import hashlib

    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.functions.text import (
        pii_pseudonymize,
    )

    pan = "4111111111111111"
    h = hashlib.md5(pan.encode()).hexdigest()
    sur = "".join(str(int(h[j], 16) % 10) for j in range(12)) + pan[-4:]
    spaced_sur = " ".join([sur[0:4], sur[4:8], sur[8:12], sur[12:16]])
    rows = [
        Row(doc_id=1, text=f"pay {pan} or 4111 1111 1111 1111 now"),
        Row(doc_id=2, text="ref 4111111111111112 order 1234567890123"),
        Row(doc_id=3, text="amex 378282246310005 here"),
    ]
    p = pii_pseudonymize("text")
    got = {r.doc_id: (r.n, r.o) for r in
           spark.createDataFrame(rows).select(
               "doc_id", p["n_pseudonymized"].alias("n"),
               p["text_out"].alias("o")).collect()}
    assert got[1] == (2, f"pay {sur} or {spaced_sur} now")
    assert got[2] == (0, rows[1].text)  # bumped digit + decoy untouched
    amex = "378282246310005"
    ha = hashlib.md5(amex.encode()).hexdigest()
    sura = "".join(str(int(ha[j], 16) % 10) for j in range(11)) + amex[-4:]
    assert got[3] == (1, f"amex {sura} here")


def test_markdown_strip_contracts(spark):
    """Fence decoys never leak, links/images reduce to text, markers
    strip, rules vanish, emphasis unwraps, whitespace collapses."""
    from quickstart_streaming_agents_spark.functions.text import (
        markdown_strip,
    )

    cases = [
        ("```\n# decoy header\ncode()\n```\nkeep", "keep"),
        ("use `inline()` here", "use  here".replace("  ", " ")),
        ("![alt text](http://x/i.png) and [anchor](http://y)",
         "alt text and anchor"),
        ("# H1\n## H2\nbody", "H1 H2 body"),
        ("> quoted\n>also", "quoted also"),
        ("- a\n* b\n+ c\n2. d", "a b c d"),
        ("before\n---\nafter", "before after"),
        ("**bold** and *ital* and __u__ and _v_", "bold and ital and u and v"),
        ("  spaced \t out  ", "spaced out"),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(cases)], ["i", "md"]
    )
    got = {r.i: r.t for r in
           df.select("i", markdown_strip("md").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i])


def test_code_signals_contracts(spark):
    """Symbol-density and keyword+structure routes both fire; prose
    containing keyword WORDS without structure does not; empty text is
    not code."""
    from pyspark.sql import Row

    from quickstart_streaming_agents_spark.functions.text import (
        code_signals,
    )

    rows = [
        Row(i=1, t="def f(x):\n    return x + 1\nimport os"),
        Row(i=2, t="int a=1; { b=2; } (c<3);"),          # dense symbols
        Row(i=3, t="the class of events for the return trip home"),
        Row(i=4, t="plain prose with no signals at all"),
        Row(i=5, t=""),
    ]
    s = code_signals("t")
    got = {r.i: (r.kw, r.code) for r in
           spark.createDataFrame(rows).select(
               "i", s["n_keywords"].alias("kw"),
               s["is_code"].alias("code")).collect()}
    assert got[1] == (3, True)
    assert got[2][1] is True
    assert got[3] == (2, False)
    assert got[4] == (0, False)
    assert got[5][1] is False
