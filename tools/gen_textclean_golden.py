"""Generate (or verify) tests/data/textclean_golden.json.

The fixture pins ``utils/textclean.fix_text`` to several hundred
input -> expected pairs covering the reference prompter's reachable
surface (mojibake, entities, width folding, quotes/ligatures, controls,
surrogates, no-op texts; wan_prompter.py:11-20).

Two oracle modes:

  * ``--with-ftfy`` (requires the real ftfy package): expected outputs are
    ``ftfy.fix_text(input)`` verbatim, and the run FAILS if the checked-in
    fixture disagrees -- the ground-truth re-verification path. Run this
    once in any environment that has ftfy to certify (or regenerate) the
    fixture against the actual library.
  * default (no ftfy, the mode that produced the checked-in file): expected
    outputs are derived from oracles INDEPENDENT of utils/textclean:
      - mojibake inputs are constructed with the stdlib's real cp1252 /
        latin-1 codecs (target.encode('utf-8').decode(codec)); recovering
        the target is ftfy's core documented guarantee. Targets are chosen
        to be fixed points of ftfy's post-fixers (no curly quotes /
        ligatures / fullwidth in targets) so expected == target with no
        derived post-processing step that could share a bug with the
        implementation.
      - entity/width/quote/ligature/control/surrogate expectations come
        from html.unescape, unicodedata NFKC/NFC and the published Unicode
        tables, written out literally.
    Heuristic-gated ftfy behaviors where fix_text's output is NOT
    mechanically derivable (restore_byte_a0 on ambiguous all-caps text,
    '?'-marker lossy sequences) are deliberately NOT in the fixture; they
    live in tests/test_textclean.py with their documented rationale.

Usage:
    python tools/gen_textclean_golden.py            # regenerate (stdlib)
    python tools/gen_textclean_golden.py --check    # verify current file
    python tools/gen_textclean_golden.py --with-ftfy [--check]
"""
from __future__ import annotations

import html
import json
import os
import sys
import unicodedata

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   os.pardir, "tests", "data", "textclean_golden.json")

# Mojibake recovery targets. Constraints for a derivable expectation:
#   * fixed point of NFC (checked below) and of ftfy's post-fixers: no
#     curly quotes, no ligature chars, no full/halfwidth forms;
#   * long enough that the misread is unambiguous mojibake to any
#     detector (>= 2 non-ASCII-involving chars or word context);
#   * no trailing U+00A0-continuation cases (those are the heuristic
#     restore_byte_a0 territory kept out of the fixture).
MOJIBAKE_TARGETS = [
    # Latin accents in word context
    "été chaud", "l'humanité entière", "café crème", "naïve approche",
    "Größe ändern", "El Niño weather", "français québécois",
    "português brasileiro", "Čeština říkala", "señorita española",
    "Zürich München", "crème brûlée", "tête-à-tête", "raison d'être",
    "piñata fiesta", "jalapeño pepper", "smörgåsbord",
    "Å andra sidan", "Ægir sjøen", "œuvre d'art", "garçon français",
    "über alles", "schön wäre es", "año nuevo", "cañón grande",
    "révolution française", "población española", "direção certa",
    "łódź żółta", "świat północy", "Köln Düsseldorf",
    # punctuation & symbols (straight-quote world only)
    "« guillemets français »", "IKEA® meubler", "température 25°C",
    "±5 µm tolerance", "£20 versus €15", "¿Qué pasa?", "¡Hola señor!",
    "copyright © 2026", "section § 4", "pi ≈ 3.14159", "x ≠ y",
    "30° angle", "n° 5", "prix: 100 ¤", "½ + ¼ = ¾",
    # Cyrillic
    "привет мир", "Москва столица", "русский язык", "хорошо спасибо",
    "девушка красивая", "первый второй",
    # Greek
    "γειά σου κόσμε", "ελληνικά γράμματα", "Ωμέγα άλφα",
    # CJK
    "こんにちは世界", "日本語テキスト処理", "中文测试文本", "漢字汉字",
    "한국어 텍스트", "서울 부산",
    # Devanagari, Thai, Arabic, Hebrew
    "नमस्ते दुनिया", "สวัสดีครับ", "مرحبا بالعالم", "שלום עולם",
    # symbols & emoji
    "✔ check mark", "→ arrow here ☃", "★ five stars ★", "♥ hearts ♦",
    "😂 laughing", "🎥 camera roll", "👍🏼 thumbs", "🚀 to the moon",
    "∑ and ∫ math", "∞ infinity",
]

# clean sentences used to embed mojibake words (per-chunk repair)
EMBED_FRAMES = [
    ("The director said", "on set yesterday."),
    ("a cinematic shot of", "at golden hour"),
    ("she whispered", "and walked away"),
    ("prompt:", "8k, film grain"),
]

# no-op corpus: fix_text must return these unchanged (all NFC fixed points)
NOOP_TEXTS = [
    "A cinematic drone shot over a misty fjord at dawn",
    "café au lait", "naïve El Niño", "Die Größe der Stadt", "résumé",
    "å 1 Å 2 angstrom", "正體字測試", "日本語のプロンプト映像",
    "emoji 🎥 stays as is", "русский текст без ошибок",
    "ελληνικό κείμενο", "mixed français + 中文 + русский",
    "question? answer! 100%", "a-b_c.d/e\\f", "line one\nline two",
    "tabs\tstay", "«French quotes» stay", "math: ∀x ∈ ℝ, x² ≥ 0",
    "prices: $5 €6 £7 ¥8", "snowman ☃ and star ★",
    "MAIÚSCULAS PORTUGUESAS", "ação correta", "coração valente",
    "10 μm × 20 μm", "judgement: 90° turn",
]

# literal table-driven expectations (Unicode-published mappings)
LITERAL_PAIRS = [
    # uncurl_quotes (ftfy.fixes.uncurl_quotes table)
    ("‘single’ quotes", "'single' quotes"),
    ("“double” quotes", '"double" quotes'),
    ("it’s „quoted“ low", "it's \"quoted\" low"),
    ("‛reversed‟ marks", "'reversed\" marks"),
    # fix_latin_ligatures
    ("ﬁlm ﬂow ofﬁce", "film flow office"),
    ("diﬃcult aﬄuent", "difficult affluent"),
    ("Ĳsselmeer ĳs", "IJsselmeer ijs"),
    ("ﬅreet ﬆop", "street stop"),
    # fix_character_width: fullwidth -> ASCII
    ("ＦＵＬＬｗｉｄｔｈ！", "FULLwidth!"),
    ("５６７ ｎｕｍｂｅｒｓ", "567 numbers"),
    ("ｈｅｌｌｏ　ｗｏｒｌｄ", "hello world"),        # ideographic space
    ("ＡＢＣ（ｄｅｆ）", "ABC(def)"),
    # fix_character_width: halfwidth katakana -> fullwidth (+ NFC dakuten)
    ("ｶﾀｶﾅ", "カタカナ"),
    ("ｶﾞｷﾞｭｳ", "ガギュウ"),
    ("ﾊﾟﾝ屋", "パン屋"),
    ("ｱｲｳ｡｢ｴ｣", "アイウ。「エ」"),
    # remove_terminal_escapes
    ("a\x1b[31mred\x1b[0mb", "aredb"),
    ("\x1b[1;32mbold green\x1b[m end", "bold green end"),
    # fix_line_breaks
    ("line1\r\nline2\rline3", "line1\nline2\nline3"),
    ("para break nextlast", "para\nbreak\nnext\nlast"),
    # remove_control_chars (C0/C1/BOM; \n and \t survive)
    ("nul\x00l bel\x07l", "null bell"),
    ("keep\ttab\nand newline", "keep\ttab\nand newline"),
    ("﻿BOM stripped", "BOM stripped"),
    # NFC normalization (decomposed -> composed)
    ("café decompose", "café decompose"),
    ("Ångström", "Ångström"),
    # surrogate repair
    ("😂 pair joined", "😂 pair joined"),
    ("lone\ud800marker", "lone�marker"),
    ("🎥 camera", "🎥 camera"),
]

# html entities: unescape_html='auto' fires when no '<' in text; expected
# is ONE html.unescape pass (fix_text does one; the reference's
# basic_clean adds its own double pass afterwards)
ENTITY_PAIRS = [
    ("fish &amp; chips", "fish & chips"),
    ("fish &amp;amp; chips", "fish &amp; chips"),
    ("&quot;quoted&quot; text", '"quoted" text'),
    ("Tom &amp; Jerry &copy; 1940", "Tom & Jerry © 1940"),
    ("&macr; macron", "¯ macron"),
    ("A&nbsp;B", "A\xa0B"),
    ("&#233;t&#233;", "été"),
    ("&#x1F600; grin", "😀 grin"),
    ("&ldquo;curly&rdquo;", '"curly"'),   # entity -> curly -> uncurled
    ("&eacute;l&egrave;ve", "élève"),
    ("caf&eacute; &times; 2", "café × 2"),
    ("&lt;b&gt;markup stays escaped&lt;/b&gt;",
     "<b>markup stays escaped</b>"),
]


def _misread(s: str, codec: str):
    try:
        bad = s.encode("utf-8").decode(codec)
    except UnicodeDecodeError:
        return None
    return bad if bad != s else None


def build_cases():
    cases = []

    def add(cls, inp, exp):
        if all(c["input"] != inp for c in cases):
            cases.append({"class": cls, "input": inp, "expected": exp})

    for target in MOJIBAKE_TARGETS:
        assert unicodedata.normalize("NFC", target) == target, target
        for codec in ("cp1252", "latin-1"):
            bad = _misread(target, codec)
            if bad is None or "\xa0" in bad:
                # trailing-a0 shapes are restore_byte_a0 territory --
                # heuristic-gated in ftfy, excluded from the fixture
                continue
            add(f"mojibake_{codec}", bad, target)
        once = _misread(target, "cp1252")
        if once and "\xa0" not in once:
            twice = _misread(once, "cp1252")
            if twice and "\xa0" not in twice:
                add("mojibake_double", twice, target)

    for i, target in enumerate(MOJIBAKE_TARGETS[::3]):
        bad = _misread(target, "cp1252")
        if bad is None or "\xa0" in bad:
            continue
        left, right = EMBED_FRAMES[i % len(EMBED_FRAMES)]
        add("mojibake_embedded", f"{left} {bad} {right}",
            f"{left} {target} {right}")

    for t in NOOP_TEXTS:
        assert unicodedata.normalize("NFC", t) == t, t
        add("noop", t, t)

    for bad, good in LITERAL_PAIRS:
        add("fixer_table", bad, good)

    for bad, good in ENTITY_PAIRS:
        # self-check: expected must be one html.unescape pass, optionally
        # post-processed by the quote-uncurler (the '&ldquo;' cases)
        one = html.unescape(bad)
        uncurled = one.translate({0x2018: "'", 0x2019: "'", 0x201C: '"',
                                  0x201D: '"'})
        assert good in (one, uncurled), (bad, good, one)
        add("entity", bad, good)

    return cases


def main(argv):
    check = "--check" in argv
    with_ftfy = "--with-ftfy" in argv
    cases = build_cases()
    oracle = "stdlib-codec-construction"

    if check:
        # check mode NEVER writes: it certifies the CHECKED-IN fixture
        # against (a) this generator's derivation and, with --with-ftfy,
        # (b) real ftfy run over the fixture's own inputs.
        with open(OUT) as fh:
            cur = json.load(fh)
        rc = 0
        # expectations are only comparable when the fixture carries this
        # generator's own oracle; an ftfy-regenerated fixture legitimately
        # differs in `expected`, so compare the input census instead
        stdlib_oracle = cur["oracle"].startswith("stdlib")
        ref = cases if stdlib_oracle else [
            {k: c[k] for k in ("class", "input")} for c in cases]
        got = cur["cases"] if stdlib_oracle else [
            {k: c[k] for k in ("class", "input")} for c in cur["cases"]]
        if ref != got:
            print(f"fixture DIFFERS from generator derivation "
                  f"({cur['count']} checked-in vs {len(cases)} derived, "
                  f"compared {'fully' if stdlib_oracle else 'inputs-only'})",
                  file=sys.stderr)
            rc = 1
        else:
            print(f"fixture matches generator ({cur['count']} cases, "
                  f"oracle={cur['oracle']})")
        if with_ftfy:
            import ftfy                  # the real library, on purpose
            mismatches = [
                (c["input"], c["expected"], got)
                for c in cur["cases"]
                if (got := ftfy.fix_text(c["input"])) != c["expected"]]
            if mismatches:
                print(f"{len(mismatches)} checked-in expectations disagree "
                      f"with real ftfy {ftfy.__version__}:", file=sys.stderr)
                for inp, exp, got in mismatches[:20]:
                    print(f"  {inp!r}: fixture {exp!r} != ftfy {got!r}",
                          file=sys.stderr)
                rc = 1
            else:
                print(f"fixture certified against ftfy {ftfy.__version__} "
                      f"({len(cur['cases'])} cases)")
        return rc

    if with_ftfy:
        import ftfy                      # the real library, on purpose
        oracle = f"ftfy {ftfy.__version__}"
        mismatches = []
        for c in cases:
            got = ftfy.fix_text(c["input"])
            if got != c["expected"]:
                mismatches.append((c["input"], c["expected"], got))
            c["expected"] = got
        if mismatches:
            print(f"{len(mismatches)} derived expectations disagree with "
                  f"real ftfy (fixture will carry ftfy's answers):",
                  file=sys.stderr)
            for inp, exp, got in mismatches[:20]:
                print(f"  {inp!r}: derived {exp!r} != ftfy {got!r}",
                      file=sys.stderr)
    doc = {"oracle": oracle, "count": len(cases), "cases": cases}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        # ensure_ascii: the lone-surrogate cases are not
        # representable in a UTF-8 stream; \uXXXX escapes round-trip them
        json.dump(doc, fh, ensure_ascii=True, indent=1)
    print(f"wrote {len(cases)} cases to {OUT} (oracle: {oracle})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
