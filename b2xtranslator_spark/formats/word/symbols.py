"""Symbol-font -> Unicode conversion.

Behavioral re-implementation of the reference symbol tables
(/root/reference/Common/Tools/SymbolMapping.cs:10-300): Microsoft Symbol font
(Greek + math + arrows) and Wingdings, with the same ASCII/placeholder
fallbacks. Used when a run carries sprmCSymbol (w:sym events).
"""

from __future__ import annotations

_SYMBOL_FONT = {
    # Greek lowercase
    0x61: "α", 0x62: "β", 0x63: "χ", 0x64: "δ", 0x65: "ε", 0x66: "φ",
    0x67: "γ", 0x68: "η", 0x69: "ι", 0x6A: "ϕ", 0x6B: "κ", 0x6C: "λ",
    0x6D: "μ", 0x6E: "ν", 0x6F: "ο", 0x70: "π", 0x71: "θ", 0x72: "ρ",
    0x73: "σ", 0x74: "τ", 0x75: "υ", 0x76: "ϖ", 0x77: "ω", 0x78: "ξ",
    0x79: "ψ", 0x7A: "ζ", 0x7B: "{", 0x7C: "|", 0x7D: "}", 0x7E: "~",
    0x7F: "",
    # Greek uppercase
    0x41: "Α", 0x42: "Β", 0x43: "Χ", 0x44: "Δ", 0x45: "Ε", 0x46: "Φ",
    0x47: "Γ", 0x48: "Η", 0x49: "Ι", 0x4A: "ϑ", 0x4B: "Κ", 0x4C: "Λ",
    0x4D: "Μ", 0x4E: "Ν", 0x4F: "Ο", 0x50: "Π", 0x51: "Θ", 0x52: "Ρ",
    0x53: "Σ", 0x54: "Τ", 0x55: "Υ", 0x56: "ς", 0x57: "Ω", 0x58: "Ξ",
    0x59: "Ψ", 0x5A: "Ζ",
    # math
    0x2B: "±", 0x2D: "−", 0x2A: "∗", 0x2F: "/", 0x3D: "=", 0x3C: "<",
    0x3E: ">", 0xB1: "±", 0xB7: "·", 0xD7: "×", 0xF7: "÷", 0xB0: "°",
    0xB5: "μ", 0xA3: "≤", 0xB3: "≥", 0xB9: "¹", 0xB2: "²", 0xBD: "½",
    0xBC: "¼", 0xBE: "¾",
    # arrows
    0xAB: "←", 0xBB: "→", 0xAC: "↑", 0xDB: "↔", 0xDD: "↕",
    # other
    0xA5: "∞", 0xB6: "∂", 0xD1: "∑", 0xD5: "∏", 0xD6: "√", 0xD8: "∝",
    0xDC: "∠", 0xE0: "◊", 0xE5: "∅", 0xE6: "∈", 0xE7: "∉", 0xE8: "∋",
    0xE9: "∌", 0xEA: "∩", 0xEB: "∪", 0xEC: "⊂", 0xED: "⊃", 0xEE: "⊆",
    0xEF: "⊇", 0xF0: "⊥", 0xF1: "∴", 0xF2: "∵",
}

_WINGDINGS_FONT = {
    0x4A: "☺", 0x4B: "☻", 0x4C: "♥", 0x4D: "♦", 0x4E: "♣", 0x4F: "♠",
    0x6C: "✓", 0x6D: "✗", 0x6E: "✪", 0x6F: "✫", 0x70: "✬", 0x71: "✭",
    0x72: "✮", 0x73: "✯", 0x74: "✰", 0x75: "✱", 0x76: "✲", 0x77: "✳",
    0x78: "✴", 0x79: "✵", 0x7A: "✶", 0x81: "✁", 0x82: "✂", 0x83: "✃",
    0x84: "✄", 0x85: "☎", 0x86: "✆", 0x87: "✇", 0x88: "✈", 0x89: "✉",
    0x8A: "✊", 0x8B: "✋", 0x8C: "✌", 0x8D: "✍", 0x8E: "✎", 0x8F: "✏",
    0x90: "✐", 0x91: "✑", 0x92: "✒", 0x93: "✓", 0x94: "✔", 0x95: "✕",
    0x96: "✖", 0x97: "✗", 0x98: "✘", 0x99: "✙", 0x9A: "✚", 0x9B: "✛",
    0x9C: "✜", 0x9D: "✝", 0x9E: "✞", 0x9F: "✟", 0xA0: "✠", 0xA1: "✡",
    0xA2: "✢", 0xA3: "✣", 0xA4: "✤", 0xA5: "✥", 0xA6: "✦", 0xA7: "✧",
    0xA8: "✨", 0xA9: "✩", 0xAA: "✪", 0xAB: "✫", 0xAC: "✬", 0xAD: "✭",
    0xAE: "✮", 0xAF: "✯",
}


def _fallback(char_code: int, identity_high: bool) -> str:
    if 32 < char_code < 127:
        return chr(char_code)
    if char_code > 127 and identity_high:
        # identity pass-through for the Symbol font: matches the expected
        # fixtures (samples/symbol.expected.txt carries U+0080..U+00FF for
        # unmapped codes) where the reference's current '?' is one of its
        # tracked regressions (failing-samples.txt: symbol.actual.txt);
        # Wingdings fixtures expect '?' (samples/wingding.expected.txt)
        return chr(char_code)
    return "?"


def convert_symbol_character(char_code: int, font_name: str | None) -> str:
    normalized = (font_name or "").lower()
    if normalized == "symbol":
        hit = _SYMBOL_FONT.get(char_code)
        if hit is not None:
            return hit
        return _fallback(char_code, True)
    if normalized == "wingdings":
        hit = _WINGDINGS_FONT.get(char_code)
        if hit is not None:
            return hit
    return _fallback(char_code, False)


def convert_symbol_hex(hex_value: str, font_name: str | None) -> str:
    """SymbolMapping.ConvertSymbolHex: parse hex, truncate to a byte."""
    if not hex_value:
        return "?"
    try:
        code = int(hex_value, 16) & 0xFFFF
    except ValueError:
        return "?"
    return convert_symbol_character(code & 0xFF, font_name)
