"""Prompt text cleaning with reference-prompter semantics.

The reference tokenizes prompts through ``whitespace_clean(basic_clean(text))``
where ``basic_clean = ftfy.fix_text(text); html.unescape(html.unescape(text))``
(diffsynth_wan21/prompters/wan_prompter.py:11-20,76; identical in wan22).
A prompt with mojibake or HTML entities therefore tokenizes differently from
its raw form, and every downstream activation diverges.

ftfy is not a baked-in dependency here, so this module implements the subset
of ``ftfy.fix_text`` default behavior that is reachable from prompt text,
natively:

  * fix_encoding       -- iterative mojibake repair (UTF-8 read as
                          cp1252/latin-1), the core of ftfy. Implemented with
                          the "sloppy cp1252" byte map and a strict-UTF-8
                          re-decode acceptance test per whitespace-delimited
                          chunk (ASCII space can never be a UTF-8
                          continuation byte, so chunking is lossless).
  * unescape_html auto -- entities unescaped when the text isn't HTML markup.
  * remove_terminal_escapes, fix_latin_ligatures, fix_character_width,
    uncurl_quotes, fix_line_breaks, remove_control_chars, NFC normalization
    -- direct translations of the corresponding ftfy fixers.

Not implemented (documented gaps, all unreachable from sane prompt strings):
``restore_byte_a0``/``replace_lossy_sequences`` (need lossy '?' markers),
``fix_surrogates`` (unpaired UTF-16 surrogates can't appear in a Python str
from JSON/argv), halfwidth-katakana widening.
"""
from __future__ import annotations

import html
import re
import unicodedata

# cp1252's 27 printable remappings of the C1 range; every other codepoint
# <= 0xFF maps to its own byte value ("sloppy" cp1252, so that literal C1
# control characters survive the round trip the way ftfy's sloppy codec
# keeps them).
_CP1252_SPECIALS = {
    "€": 0x80, "‚": 0x82, "ƒ": 0x83, "„": 0x84,
    "…": 0x85, "†": 0x86, "‡": 0x87, "ˆ": 0x88,
    "‰": 0x89, "Š": 0x8A, "‹": 0x8B, "Œ": 0x8C,
    "Ž": 0x8E, "‘": 0x91, "’": 0x92, "“": 0x93,
    "”": 0x94, "•": 0x95, "–": 0x96, "—": 0x97,
    "˜": 0x98, "™": 0x99, "š": 0x9A, "›": 0x9B,
    "œ": 0x9C, "ž": 0x9E, "Ÿ": 0x9F,
}


def _encode_sloppy_cp1252(text: str):
    """Bytes the text would have been, had it been UTF-8 misread as cp1252.
    None if any character has no cp1252/latin-1 byte (then it can't be
    mojibake of that kind)."""
    out = bytearray()
    for ch in text:
        cp = ord(ch)
        if cp <= 0xFF:
            out.append(cp)
        else:
            b = _CP1252_SPECIALS.get(ch)
            if b is None:
                return None
            out.append(b)
    return bytes(out)


def _fix_chunk_once(chunk: str):
    """One mojibake-repair pass on a whitespace-free chunk. Acceptance test:
    the sloppy-cp1252 bytes must decode as STRICT UTF-8 and actually consume
    multi-byte sequences (len shrinks) -- plain accented text fails the
    strict decode, so 'café'-style genuine Latin-1 is never mangled."""
    if not any(ord(c) > 0x7F for c in chunk):
        return chunk, False
    raw = _encode_sloppy_cp1252(chunk)
    if raw is None:
        return chunk, False
    try:
        fixed = raw.decode("utf-8")
    except UnicodeDecodeError:
        return chunk, False
    if len(fixed) >= len(chunk):
        return chunk, False
    return fixed, True


def fix_encoding(text: str, max_passes: int = 4) -> str:
    """Repair UTF-8-misread-as-cp1252 mojibake, including multiply-encoded
    text (each pass unwraps one layer, e.g. 'doesnÃ¢a€...'
    -> 'doesna€™t' -> 'doesn’t')."""
    parts = re.split(r"([ \t\n\r\f\v]+)", text)
    out = []
    for part in parts:
        for _ in range(max_passes):
            part, changed = _fix_chunk_once(part)
            if not changed:
                break
        out.append(part)
    return "".join(out)


_ANSI_RE = re.compile(r"\033\[((?:\d|;)*)([a-zA-Z])")

_LIGATURES = {
    ord("Ĳ"): "IJ", ord("ĳ"): "ij",
    ord("ﬀ"): "ff", ord("ﬁ"): "fi", ord("ﬂ"): "fl",
    ord("ﬃ"): "ffi", ord("ﬄ"): "ffl", ord("ﬅ"): "st",
    ord("ﬆ"): "st",
}

_UNCURL = {
    ord("‘"): "'", ord("’"): "'", ord("‚"): "'",
    ord("‛"): "'",
    ord("“"): '"', ord("”"): '"', ord("„"): '"',
    ord("‟"): '"',
}

# Fullwidth ASCII block (U+FF01..U+FF5E) -> ASCII; the common fullwidth
# currency/sign block entries NFKC also folds.
_WIDTH = {cp: chr(cp - 0xFEE0) for cp in range(0xFF01, 0xFF5F)}
_WIDTH.update({0xFFE0: "¢", 0xFFE1: "£", 0xFFE2: "¬",
               0xFFE3: "¯", 0xFFE4: "¦", 0xFFE5: "¥",
               0xFFE6: "₩", 0x3000: " "})

_LINE_BREAKS = {ord("\r"): "\n", 0x2028: "\n", 0x2029: "\n", 0x0085: "\n"}

_CONTROL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f﻿]")

_ENTITY_RE = re.compile(r"&(#\d+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")


def fix_text(text: str) -> str:
    """Native subset of ftfy.fix_text() with default config, in ftfy's fixer
    order: unescape-html(auto) -> terminal escapes -> mojibake ->
    ligatures -> width -> uncurl quotes -> line breaks -> control chars ->
    NFC."""
    if "<" not in text and _ENTITY_RE.search(text):
        text = html.unescape(text)
    text = _ANSI_RE.sub("", text)
    text = fix_encoding(text)
    text = text.translate(_LIGATURES)
    text = text.translate(_WIDTH)
    text = text.translate(_UNCURL)
    text = text.replace("\r\n", "\n").translate(_LINE_BREAKS)
    text = _CONTROL_RE.sub("", text)
    return unicodedata.normalize("NFC", text)


def basic_clean(text: str) -> str:
    """wan_prompter.py:11-14: fix_text then a DOUBLE html.unescape (handles
    double-escaped entities like '&amp;amp;'), then strip."""
    text = fix_text(text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    """wan_prompter.py:17-20: collapse all whitespace runs to single
    spaces."""
    return re.sub(r"\s+", " ", text).strip()


def clean_prompt(text: str) -> str:
    """The exact preprocessing the reference tokenizer applies with
    clean='whitespace' (wan_prompter.py:74-76, 95)."""
    return whitespace_clean(basic_clean(text))
