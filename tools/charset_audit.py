"""Charset-detection divergence audit (VERDICT r3 'What's missing' #2).

The reference detects charsets with ICU (icudet.pas,
trcharsetconverter.pas:96-147); this rebuild uses a strict-UTF-8 fast
path + charset_normalizer (crawl/fetcher.py::detect_charset).  ICU is
not installable in this sandbox, so the deviation is bounded against
GROUND TRUTH instead: for every (charset, language sample) pair below,
the sample is encoded, sniffed UNDECLARED through detect_charset, and
the decode through the detected codec is compared character-by-character
to the original text.  That bounds real-corpus damage tighter than an
ICU A/B would (ICU itself mis-detects some of these).

Outputs:
  - CHARSETS.md                       — the human-readable audit table
  - tests/fixtures/charset_audit.json — machine-readable, pinned by
    tests/test_charset.py::test_divergence_bounds_pinned so the bounds
    cannot drift silently when charset_normalizer or the sniffer change.

Verdicts per row:
  exact    detected codec decodes the bytes to the original text
  lossy    decodes with character errors (rate recorded)
  wrong    detector picked an incompatible codec (error rate ~ high)

Declared charsets never diverge (declared wins, decode_content) — this
audit is the UNDECLARED path only, the one ICU served in the reference.

Run:  python tools/charset_audit.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from texrex_ray.crawl.fetcher import decode_content, detect_charset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# deterministic per-language samples, repeated to fill the sniff window
SAMPLES = {
    "polish": "Zażółć gęślą jaźń, pchnąć w tę łódź jeża lub ośm skrzyń fig. ",
    "czech": "Příliš žluťoučký kůň úpěl ďábelské ódy, čeští lingvisté žasli. ",
    "russian": "Съешь же ещё этих мягких французских булок, да выпей чаю. ",
    "greek": "Ξεσκεπάζω την ψυχοφθόρα βδελυγμία· η γλώσσα είναι εργαλείο. ",
    "turkish": "Pijamalı hasta yağız şoföre çabucak güvendi; ığdır ölçüsü. ",
    "french": "Portez ce vieux whisky au juge blond qui fume sa cigarette. Où? Là, à côté… ",
    "german": "Zwölf Boxkämpfer jagen Viktor quer über den großen Sylter Deich. Äußerst gefährlich! ",
    "arabic": "نص حكيم له سر قاطع وذو شأن عظيم مكتوب على ثوب أخضر ومغلف بجلد أزرق. ",
    "hebrew": "דג סקרן שט בים מאוכזב ולפתע מצא חברה. השפה העברית עשירה מאוד. ",
    "japanese": "日本語のテキストです。漢字とひらがなとカタカナを含みます。いろはにほへと、ちりぬるを。",
    "chinese_s": "我能吞下玻璃而不伤身体。中文简体字的检测样本，包含常用汉字。",
    "chinese_t": "我能吞下玻璃而不傷身體。中文繁體字的檢測樣本，包含常用漢字。",
    "korean": "키스의 고유조건은 입술끼리 만나야 하고 특별한 기술은 필요치 않다. 한국어 문장입니다. ",
    "thai": "เป็นมนุษย์สุดประเสริฐเลิศคุณค่า กว่าบรรดาฝูงสัตว์เดรัจฉาน ภาษาไทยสวยงาม ",
    "ascii": "The quick brown fox jumps over the lazy dog. Plain ASCII sample text here. ",
}

# (codec, language) battery: the web-legacy encodings a 100-TB crawl meets
BATTERY = [
    ("utf-8", "japanese"),
    ("utf-8", "arabic"),
    ("utf-16", "russian"),
    ("cp1252", "french"),
    ("cp1252", "german"),
    ("iso-8859-2", "polish"),
    ("iso-8859-2", "czech"),
    ("windows-1250", "polish"),
    ("windows-1250", "czech"),
    ("iso-8859-5", "russian"),
    ("windows-1251", "russian"),
    ("koi8-r", "russian"),
    ("iso-8859-7", "greek"),
    ("windows-1253", "greek"),
    ("iso-8859-9", "turkish"),
    ("windows-1254", "turkish"),
    ("iso-8859-15", "french"),
    ("windows-1256", "arabic"),
    ("windows-1255", "hebrew"),
    ("shift_jis", "japanese"),
    ("cp932", "japanese"),
    ("euc-jp", "japanese"),
    ("iso-2022-jp", "japanese"),
    ("gb2312", "chinese_s"),
    ("gbk", "chinese_s"),
    ("gb18030", "chinese_s"),
    ("big5", "chinese_t"),
    ("euc-kr", "korean"),
    ("tis-620", "thai"),
    ("ascii", "ascii"),
]

REPEAT = 40  # fill most of the 32 KiB sniff window


def char_error_rate(got: str, want: str) -> float:
    n = max(len(want), 1)
    if len(got) != len(want):
        # alignment lost — count positionally over the shorter + length gap
        m = min(len(got), len(want))
        errs = sum(a != b for a, b in zip(got[:m], want[:m])) + abs(len(got) - len(want))
        return min(1.0, errs / n)
    return sum(a != b for a, b in zip(got, want)) / n


def audit() -> list[dict]:
    rows = []
    for codec, lang in BATTERY:
        text = SAMPLES[lang] * REPEAT
        try:
            raw = text.encode(codec)
        except UnicodeEncodeError:  # pragma: no cover — battery is encodable
            continue
        detected = detect_charset(raw)
        got, used = decode_content(raw, "")  # undeclared path end to end
        cer = char_error_rate(got, text)
        verdict = "exact" if cer == 0.0 else ("lossy" if cer < 0.2 else "wrong")
        rows.append(
            {
                "codec": codec,
                "lang": lang,
                "detected": detected,
                "decoded_as": used,
                "char_error_rate": round(cer, 4),
                "verdict": verdict,
            }
        )
    return rows


def main() -> None:
    rows = audit()
    with open(os.path.join(REPO, "tests", "fixtures", "charset_audit.json"), "w") as f:
        json.dump(rows, f, indent=1)

    n_exact = sum(r["verdict"] == "exact" for r in rows)
    lines = [
        "# Charset-detection divergence bounds",
        "",
        "Generated by `python tools/charset_audit.py`; pinned by",
        "`tests/test_charset.py::test_divergence_bounds_pinned`.",
        "",
        "The reference detects undeclared charsets with ICU; this rebuild",
        "uses strict-UTF-8 + charset_normalizer (a DECLARED deviation,",
        "SURVEY §7.4).  ICU is absent from this sandbox, so the deviation",
        "is bounded against ground truth: each row encodes a language",
        "sample in a legacy codec, sniffs it UNDECLARED, and compares the",
        "decode to the original text.  Declared charsets never take this",
        "path (declared wins).",
        "",
        f"**{n_exact}/{len(rows)} battery rows decode exactly.**  Every",
        "non-exact row below is a known divergence bound to audit against",
        "a real ICU host:",
        "",
        "| codec | language | detected | decoded as | char error rate | verdict |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['codec']} | {r['lang']} | {r['detected']} | "
            f"{r['decoded_as']} | {r['char_error_rate']:.4f} | {r['verdict']} |"
        )
    lines += [
        "",
        "Reading the table:",
        "",
        "- `exact` — the detected codec reproduces the original text even",
        "  when it is not the encoder's name (e.g. cp932 ⊇ shift_jis,",
        "  gb18030 ⊇ gbk ⊇ gb2312, windows-125x ⊇ iso-8859-x cousins).",
        "- `lossy` / `wrong` — the sniffer picked an incompatible codec;",
        "  these charsets NEED a declared charset (HTTP header or meta)",
        "  to decode correctly, exactly the rows to spot-check against",
        "  ICU on the first ICU-capable host.",
        "",
    ]
    with open(os.path.join(REPO, "CHARSETS.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"CHARSETS.md + charset_audit.json: {n_exact}/{len(rows)} exact")
    for r in rows:
        if r["verdict"] != "exact":
            print("  DIVERGES:", r)


if __name__ == "__main__":
    main()
