"""Prompt cleaning parity with the reference's whitespace_clean(basic_clean).

The reference implements basic_clean with ftfy.fix_text + double
html.unescape (wan_prompter.py:11-14). ftfy is not installed in this image,
so expected values here are the documented outputs of ftfy's own test
corpus / README examples, hard-coded; when ftfy IS importable the suite
additionally cross-checks against it directly.
"""
import pytest

import conftest  # noqa: F401

from fantasy_world_tpu.utils.textclean import (basic_clean, clean_prompt,
                                               fix_encoding, fix_text,
                                               whitespace_clean)


def test_fix_encoding_single_layer_mojibake():
    # utf-8 read as cp1252/latin-1 (ftfy README headline examples)
    assert fix_encoding("âœ” No problems") == "✔ No problems"
    assert fix_encoding("The Mona Lisa doesnâ€™t have eyebrows.") == \
        "The Mona Lisa doesn’t have eyebrows."
    assert fix_encoding("Ã©tÃ©") == "été"


def test_fix_encoding_double_layer_mojibake():
    # encoded twice: each repair pass unwraps one layer
    assert fix_encoding("doesnÃ¢â‚¬â„¢t") == "doesn’t"


def test_fix_encoding_leaves_genuine_text_alone():
    # genuine accents: the strict-UTF-8 acceptance test must reject
    for s in ["café", "naïve El Niño", "Die Größe", "résumé",
              "å 1 Å 2", "正體字", "日本語のプロンプト", "emoji 🎥 stays"]:
        assert fix_encoding(s) == s


def test_fix_encoding_mixed_clean_and_mojibake():
    # chunked repair: the mojibake word is fixed, the genuine one kept
    assert fix_encoding("café costs â‚¬5") == "café costs €5"


def test_basic_clean_html_entities():
    assert basic_clean("fish &amp; chips") == "fish & chips"
    # double-escaped entities need the double unescape the reference does
    assert basic_clean("fish &amp;amp; chips") == "fish & chips"
    assert basic_clean("&lt;b&gt;bold&lt;/b&gt;") == "<b>bold</b>"


def test_fix_text_quotes_ligatures_width():
    assert fix_text("“quoted” and ‘single’") == \
        '"quoted" and \'single\''
    assert fix_text("ﬁlm ﬂow") == "film flow"
    assert fix_text("ＦＵＬＬｗｉｄｔｈ！") == "FULLwidth!"


def test_fix_text_controls_and_linebreaks():
    assert fix_text("a\x1b[31mred\x1b[0mb") == "aredb"
    assert fix_text("line1\r\nline2\rline3 line4") == \
        "line1\nline2\nline3\nline4"
    assert fix_text("nul\x00l bel\x07l") == "null bell"


def test_fix_text_nfc_normalization():
    # decomposed e + combining acute -> composed é
    assert fix_text("café") == "café"


def test_whitespace_clean():
    assert whitespace_clean("  a \t b\n\nc  ") == "a b c"


def test_clean_prompt_end_to_end():
    dirty = ("  A â€œcinematicâ€\x9d shot of fish &amp;amp; chips,\r\n"
             "   ﬁlm grain  ")
    assert clean_prompt(dirty) == \
        'A "cinematic" shot of fish & chips, film grain'


def test_clean_prompt_is_noop_on_clean_prompts():
    p = ("A cinematic drone shot over a misty fjord at dawn, "
         "volumetric light, 8k film grain")
    assert clean_prompt(p) == p


def _golden():
    import json
    import os
    path = os.path.join(os.path.dirname(__file__), "data",
                        "textclean_golden.json")
    with open(path) as fh:
        return json.load(fh)


def test_golden_fixture_all_cases():
    """242-case golden fixture (tests/data/textclean_golden.json, r3 VERDICT
    next-#7): mojibake constructed with the stdlib's real cp1252/latin-1
    codecs plus table-driven entity/width/quote/control/surrogate cases.
    The fixture is generated AND re-verifiable by
    tools/gen_textclean_golden.py; when real ftfy is available anywhere,
    `--with-ftfy --check` certifies the same file against the actual
    library (ftfy is not installable in this image -- the checked-in
    expectations use the implementation-independent stdlib oracles
    documented in the generator). Runs unconditionally: no skip."""
    doc = _golden()
    assert doc["count"] == len(doc["cases"]) >= 200
    failures = []
    for case in doc["cases"]:
        got = fix_text(case["input"])
        if got != case["expected"]:
            failures.append((case["class"], case["input"],
                             case["expected"], got))
    assert not failures, f"{len(failures)} golden mismatches: {failures[:5]}"


def test_golden_fixture_covers_every_class():
    classes = {c["class"] for c in _golden()["cases"]}
    assert {"mojibake_cp1252", "mojibake_latin-1", "mojibake_double",
            "mojibake_embedded", "noop", "fixer_table",
            "entity"} <= classes


def test_golden_fixture_matches_generator():
    """The checked-in file must be exactly what the generator derives --
    stops silent drift between the data and its documented oracles."""
    import subprocess
    import sys as _sys
    import os
    tool = os.path.join(os.path.dirname(__file__), os.pardir, "tools",
                        "gen_textclean_golden.py")
    r = subprocess.run([_sys.executable, tool, "--check"],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


# ---------------------------------------------------------------------------
# round-3 corpus expansion (r2 VERDICT next-#7): the live ftfy cross-check
# self-skips in this image, so equivalence rested on ~10 hard-coded pairs.
# Below, the mojibake INPUTS are constructed with the stdlib's real cp1252 /
# latin-1 codecs (an oracle independent of the implementation's own byte
# map): for target text s, feeding s.encode('utf-8').decode(codec) through
# fix_encoding must recover s exactly. This covers every script class the
# native implementation claims: Latin accents, Greek, Cyrillic, CJK,
# Devanagari, symbols, emoji, and double-encoding.
# ---------------------------------------------------------------------------

_MOJIBAKE_TARGETS = [
    "é", "été", "l'humanité", "Perché", "Società", "naïve", "Größe",
    "El Niño", "français", "português", "ČeštinaŘ",
    "« guillemets »", "IKEA®", "température 25°C", "±5 µm", "£20 — €15",
    "“curly quotes”", "don’t … ellipsis", "en–dash em—dash",
    "привет мир", "шеллы", "Москва",
    "γειά σου κόσμε", "Ωμέγα",
    "こんにちは", "日本語テキスト", "中文测试", "한국어",
    "नमस्ते", "✔ check", "→ arrow ☃",
    "😂", "🎥 camera", "👍🏼",
]


def _misread(s, codec):
    """What s's UTF-8 bytes look like when misread as `codec`; None when
    the byte sequence is not representable in that codec (strict cp1252
    has 5 undefined bytes)."""
    try:
        return s.encode("utf-8").decode(codec)
    except UnicodeDecodeError:
        return None


@pytest.mark.parametrize("codec", ["cp1252", "latin-1"])
def test_fix_encoding_recovers_codec_constructed_mojibake(codec):
    covered = 0
    for target in _MOJIBAKE_TARGETS:
        bad = _misread(target, codec)
        if bad is None or bad == target:
            continue
        covered += 1
        assert fix_encoding(bad) == target, (codec, target, bad)
    assert covered >= 25, f"only {covered} {codec} cases were exercisable"


def test_fix_encoding_recovers_double_mojibake():
    for target in ["don’t", "été", "✔", "привет", "“q”"]:
        once = _misread(target, "cp1252")
        twice = once and _misread(once, "cp1252")
        if twice is None:
            continue
        assert fix_encoding(twice) == target, (target, twice)


def test_fix_encoding_mojibake_embedded_in_clean_sentence():
    # per-chunk repair: only the corrupted words change
    for target, clean_l, clean_r in [
            ("doesn’t", "The Mona Lisa", "have eyebrows."),
            ("café", "meet at the", "at noon"),
            ("привет", "she said", "and left")]:
        bad = _misread(target, "cp1252")
        assert bad is not None
        s = f"{clean_l} {bad} {clean_r}"
        assert fix_encoding(s) == f"{clean_l} {target} {clean_r}"


def test_fix_encoding_never_corrupts_plain_unicode():
    # the acceptance test must reject genuine text in every claimed script
    for s in _MOJIBAKE_TARGETS:
        assert fix_encoding(s) == s, s


def test_fix_text_literal_pairs_ftfy_readme():
    # hard-coded input->output pairs as published in ftfy's README/docs
    pairs = [
        ("âœ” No problems", "✔ No problems"),
        ("The Mona Lisa doesnâ€™t have eyebrows.",
         "The Mona Lisa doesn't have eyebrows."),   # + uncurl_quotes
        ("l'humanitÃ©", "l'humanité"),
        ("Ð¿ÐµÑ€Ð²Ñ‹Ð¹", "первый"),
        ("ðŸ˜‚", "😂"),
        ("IKEAÂ®", "IKEA®"),
        ("ÃƒÂ©", "é"),                               # double-encoded
        ("ï¬‚ow", "flow"),                           # mojibake ligature
        ("５６７", "567"),                            # fullwidth digits
        ("&macr;", "¯"),                             # named entity, no markup
    ]
    for bad, good in pairs:
        assert fix_text(bad) == good, (bad, good)


def test_restore_byte_a0():
    # 'à la mode' -> UTF-8 C3 A0 20 -> cp1252 'Ã\xa0 ' -> \xa0 squashed to
    # a plain space by some upstream process
    assert fix_encoding("Ã\xa0 la mode") == "à la mode"   # nbsp intact
    assert fix_encoding("Ã  la mode") == "à la mode"      # nbsp -> space
    # fully collapsed (both spaces merged): the separating space is gone
    # from the bytes, so the recovered text has none -- same lossy outcome
    # as ftfy's byte-domain restore
    assert fix_encoding("Ã la mode") == "àla mode"
    # no lead char anywhere: untouched
    assert fix_encoding("plain A text") == "plain A text"


def test_restore_byte_a0_spares_allcaps_words():
    # Genuine all-caps Portuguese words ending in Ã (uppercase letter
    # immediately before the lead char) must NOT be "repaired" -- ftfy's
    # badness heuristic carves these out, and so does our context gate.
    assert fix_encoding("MAÇÃ MADURA") == "MAÇÃ MADURA"
    assert fix_encoding("IRMÃ MAIS VELHA") == "IRMÃ MAIS VELHA"
    assert fix_text("MANHÃ DE SOL") == "MANHÃ DE SOL"
    assert fix_text("CERVEJA ALEMÃ GELADA") == "CERVEJA ALEMÃ GELADA"
    # ...but a lowercase letter before the lead char is the classic
    # squashed-\xa0 mojibake shape and is still repaired
    assert fix_encoding("VoilÃ le monde") == "Voilàle monde"
    # and a lead char at the start of the string is still repaired
    assert fix_encoding("Ã la mode") == "àla mode"
    # 'Â' has no all-caps carve-out: a squashed nbsp after an uppercase
    # word (the single most common mojibake shape) still repairs
    assert fix_encoding("NASAÂ 2026") == "NASA\xa02026"
    from fantasy_world_tpu.utils.textclean import clean_prompt
    assert clean_prompt("NASAÂ 2026") == "NASA 2026"


def test_replace_lossy_sequences():
    # 'â€œ' with its final continuation byte destroyed to U+FFFD can never
    # be repaired -> one U+FFFD, matching ftfy's lossy collapse
    assert fix_encoding("quoted â€� text") == "quoted � text"
    assert fix_encoding("Ã�") == "�"
    # an U+FFFD with no mojibake context stays as-is
    assert fix_encoding("broken � char") == "broken � char"


def test_fix_surrogates():
    assert fix_text("😂") == "😂"        # proper pair joined
    assert fix_text("a\ud800b") == "a�b"           # lone surrogate
    assert fix_text("🎥 camera") == "🎥 camera"


def test_halfwidth_katakana_widened():
    assert fix_text("ｶﾀｶﾅ") == "カタカナ"
    # dakuten compose through the final NFC
    assert fix_text("ｶﾞｷﾞｭｳ") == "ガギュウ"
    assert fix_text("ﾊﾟﾝ") == "パン"
    # halfwidth punctuation
    assert fix_text("ｱｲｳ｡｢ｴ｣") == "アイウ。「エ」"
    # genuine fullwidth katakana untouched
    assert fix_text("カタカナ") == "カタカナ"


def test_restore_byte_a0_gates_per_word_not_per_prompt():
    # A genuine literal nbsp in ONE word must not disable the squashed-\xa0
    # repair for unrelated mojibake elsewhere in the prompt (ftfy applies
    # the fixer per mojibake sequence, not gated on a whole-string property)
    from fantasy_world_tpu.utils.textclean import fix_encoding
    assert (fix_encoding("café\xa0bar VoilÃ le monde")
            == "café\xa0bar Voilàle monde")
    # the word that DOES hold a literal \xa0 is left to the plain chunk
    # repair (its bytes were demonstrably not squashed)
    assert fix_encoding("Ã\xa0 la mode") == "à la mode"
    # and a lead-char+space inside a word that also carries a literal \xa0
    # is not speculatively rewritten
    assert fix_encoding("x\xa0Ã 2") == "x\xa0Ã 2"
