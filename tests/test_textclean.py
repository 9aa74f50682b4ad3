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


def test_against_real_ftfy_if_available():
    ftfy = pytest.importorskip("ftfy")
    # conftest.add_reference_to_path stubs absent reference deps (ftfy
    # included) into sys.modules; a stub is not an oracle
    if not callable(getattr(ftfy, "fix_text", None)) \
            or ftfy.fix_text("abc") != "abc":
        pytest.skip("ftfy is a conftest stub, not the real library")
    import html
    samples = [
        "âœ” No problems", "doesnÃ¢â‚¬â„¢t", "fish &amp;amp; chips",
        "café costs â‚¬5", "ﬁlm ﬂow", "ＦＵＬＬｗｉｄｔｈ！",
        "The Mona Lisa doesnâ€™t have eyebrows.",
    ]
    for s in samples:
        ref = html.unescape(html.unescape(ftfy.fix_text(s))).strip()
        assert basic_clean(s) == ref, s
