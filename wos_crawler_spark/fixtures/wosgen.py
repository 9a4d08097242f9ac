"""Deterministic synthetic WoS field-tagged record generator.

FIXTURES.md §1: every value is derived by hashing the row key ``i`` —
no RNG state, so any partition of any size generates identical bytes
for the same ``i`` (the property that makes local[8] ≡ local[32]
output-equality testable, SURVEY.md §7.3).
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1


def splitmix64(x: int) -> int:
    """Public-domain splitmix64 mix — the only 'randomness' source."""
    x = (x + 0x9E3779B97F4A7C15) & MASK64
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return z ^ (z >> 31)


def h(i: int, salt: int) -> int:
    return splitmix64((i << 8) ^ salt)


_WORDS = (
    "spark frontier crawl parse query data batch wave token bucket bloom "
    "filter shuffle partition join scan merge sort window hash group key "
    "order row column table index vector text page host link seed robot"
).split()

_LASTS = "Leung Smith Chen Garcia Mueller Tanaka Patel Novak Rossi Kim".split()
_FIRSTS = "Tom Jane Wei Maria Hans Yuki Asha Petr Luca Min".split()
_JOURNALS = [
    "JOURNAL OF EXAMPLES",
    "DATA ENGINEERING LETTERS",
    "WEB SCIENCE QUARTERLY",
    "DISTRIBUTED SYSTEMS REVIEW",
]
_LANGS = ["English", "Chinese", "German", "Spanish"]
_DTYPES = ["Article", "Review", "Proceedings Paper"]
_CATS = [
    "Computer Science, Information Systems",
    "Information Science",
    "Engineering, Electrical",
    "Statistics",
]
_AGENCIES = ["Funding Agency One", "Agency Two", "National Fund"]

N_HOSTS = 97
HOT_HOST = "hot.example.com"


def host_of(i: int) -> str:
    """Skewed host distribution: 30% on one hot host (FIXTURES.md §1)."""
    if i % 10 < 3:
        return HOT_HOST
    return f"h{(i * 2654435761) % N_HOSTS}.example.org"


def url_of(i: int) -> str:
    return f"https://{host_of(i)}/rec/{i:08d}"


def _words(i: int, salt: int, lo: int, hi: int) -> list[str]:
    n = lo + h(i, salt) % (hi - lo + 1)
    return [_WORDS[h(i, salt * 31 + k) % len(_WORDS)] for k in range(n)]


def _authors(i: int) -> list[tuple[str, str]]:
    n = 1 + h(i, 2) % 3
    out = []
    for k in range(n):
        last = _LASTS[h(i, 100 + k) % len(_LASTS)]
        first = _FIRSTS[h(i, 200 + k) % len(_FIRSTS)]
        out.append((last, first))
    return out


#: Fixed column order of the tab-delimited export twin (WoS "Tab-
#: delimited" download format: one header row of 2-char tags, one row
#: per record). Absent fields are empty cells.
TAB_HEADER = (
    "PT AU AF TI SO LA DT DE ID AB C1 RP FU FX CR NR TC Z9 U1 U2 "
    "PU SN J9 JI PD PY VL IS BP EP DI PG WC SC GA UT"
).split()

#: Tags whose tab cell packs multiple items with '; ' (the WoS tab
#: format's list separator — same tags the plaintext grammar treats as
#: one-item-per-continuation-line).
TAB_LIST_TAGS = frozenset({"AU", "AF", "CR", "C1"})


def wos_record_fields(i: int, n_total: int) -> list[tuple[str, list[str]]]:
    """The record as ordered (tag, line-items) pairs — the single
    source both serializers derive from: the field-tagged text
    (items[0] on the tag line, the rest as 3-space continuations) and
    the tab-delimited row (items joined per TAB_LIST_TAGS)."""
    auths = _authors(i)
    title_words = _words(i, 3, 4, 8)
    abstract_words = _words(i, 4, 10, 24)
    journal = _JOURNALS[h(i, 5) % len(_JOURNALS)]
    lang = _LANGS[i % 4]
    dt = _DTYPES[h(i, 6) % len(_DTYPES)]
    kws = sorted({_WORDS[h(i, 7 + k) % len(_WORDS)] for k in range(2 + h(i, 8) % 3)})
    kwp = [w.upper() for w in kws][: 1 + h(i, 9) % 2]
    year = 2010 + h(i, 10) % 15
    n_refs = h(i, 11) % 5

    fields: list[tuple[str, list[str]]] = [("PT", ["J"])]
    fields.append(
        ("AU", [f"{last}, {first[0]}" for last, first in auths])
    )
    fields.append(("AF", [f"{last}, {first}" for last, first in auths]))
    # wrap long titles onto a continuation line (exercises P2)
    ti = [" ".join(title_words[:4])]
    if len(title_words) > 4:
        ti.append(" ".join(title_words[4:]))
    fields.append(("TI", ti))
    fields.append(("SO", [journal]))
    fields.append(("LA", [lang]))
    fields.append(("DT", [dt]))
    fields.append(("DE", ["; ".join(kws)]))
    fields.append(("ID", ["; ".join(kwp)]))
    ab = [" ".join(abstract_words[:12])]
    if len(abstract_words) > 12:
        ab.append(" ".join(abstract_words[12:]))
    fields.append(("AB", ab))
    c1 = [
        f"[{auths[0][0]}, {auths[0][1]}] Univ {h(i, 12) % 50}, "
        f"Dept CS, City, Country."
    ]
    for last, first in auths[1:]:
        c1.append(f"[{last}, {first}] Univ {h(i, 13) % 50}, Dept IS, Town, Nation.")
    fields.append(("C1", c1))
    fields.append(
        (
            "RP",
            [
                f"{auths[0][0]}, {auths[0][1][0]} (reprint author), "
                f"Univ {h(i, 12) % 50}, Dept CS, City, Country."
            ],
        )
    )
    if h(i, 14) % 3:
        ag = _AGENCIES[h(i, 15) % len(_AGENCIES)]
        fields.append(("FU", [f"{ag} [G-{h(i, 16) % 1000}]"]))
        fields.append(("FX", ["The funding text."]))
    if n_refs:
        refs = []
        for k in range(n_refs):
            j = (i * 7 + 3 + k * 13) % max(n_total, 1)
            rl, rf = _authors(j)[0]
            refs.append(
                f"{rl} {rf[0]}, {2005 + h(j, 10) % 20}, "
                f"{_JOURNALS[h(j, 5) % len(_JOURNALS)]}, V{1 + h(j, 17) % 40}, "
                f"P{1 + h(j, 18) % 900}, DOI 10.1000/rec{j:08d}"
            )
        fields.append(("CR", refs))
    fields.append(("NR", [str(n_refs)]))
    fields.append(("TC", [str(h(i, 19) % 100)]))
    fields.append(("Z9", [str(h(i, 19) % 100)]))
    fields.append(("U1", [str(h(i, 20) % 10)]))
    fields.append(("U2", [str(h(i, 21) % 50)]))
    fields.append(("PU", ["PUBLISHER"]))
    fields.append(("SN", [f"{1000 + i % 9000:04d}-{1000 + h(i, 22) % 9000:04d}"]))
    fields.append(("J9", [journal.split()[0][:8]]))
    fields.append(("JI", [f"J. {journal.split()[0].title()}."]))
    fields.append(("PD", ["FEB"]))
    fields.append(("PY", [str(year)]))
    fields.append(("VL", [str(1 + h(i, 23) % 40)]))
    fields.append(("IS", [str(1 + h(i, 24) % 12)]))
    bp = 1 + h(i, 25) % 900
    fields.append(("BP", [str(bp)]))
    fields.append(("EP", [str(bp + 10)]))
    fields.append(("DI", [f"10.1000/rec{i:08d}"]))
    fields.append(("PG", ["11"]))
    fields.append(
        ("WC", ["; ".join(sorted({_CATS[h(i, 26 + k) % len(_CATS)] for k in range(2)}))])
    )
    fields.append(("SC", [_CATS[h(i, 27) % len(_CATS)].split(",")[0]]))
    fields.append(("GA", [f"X{h(i, 28) % 100:02d}"]))
    fields.append(("UT", [f"WOS:{i:015d}"]))
    return fields


def wos_record(i: int, n_total: int) -> str:
    """One complete field-tagged record for url index ``i``. Cited
    references point at other record indices (deterministic link
    structure mirrors fixtures ``links``). Byte layout: tag line +
    3-space continuation per extra item, ER-terminated."""
    lines: list[str] = []
    for tag, items in wos_record_fields(i, n_total):
        lines.append(f"{tag} {items[0]}")
        lines.extend(f"   {it}" for it in items[1:])
    lines.append("ER")
    return "\n".join(lines)


def tab_row(i: int, n_total: int) -> str:
    """The SAME record as one tab-delimited row under TAB_HEADER:
    list tags pack items with '; ', multi-line scalars join with ' ',
    absent tags are empty cells."""
    by_tag = dict(wos_record_fields(i, n_total))
    cells = []
    for tag in TAB_HEADER:
        items = by_tag.get(tag)
        if not items:
            cells.append("")
        elif tag in TAB_LIST_TAGS:
            cells.append("; ".join(items))
        else:
            cells.append(" ".join(items))
    return "\t".join(cells)


def tab_export_payload(ids: list[int], n_total: int) -> str:
    """A whole tab-delimited export file: header row + one row per
    record (the tab twin of export_payload's ≤500-record batches)."""
    return "\n".join(
        ["\t".join(TAB_HEADER), *(tab_row(i, n_total) for i in ids)]
    ) + "\n"


def xml_export_payload(ids: list[int], n_total: int) -> str:
    """The SAME records as a WoS-XML-style export: ``<records>`` of
    ``<REC>`` elements, each field a ``<field tag=..>`` with one
    ``<item>`` per line-item (continuation items stay distinct items,
    exactly like the plaintext grammar)."""
    from xml.sax.saxutils import escape

    recs = []
    for i in ids:
        fs = "".join(
            '<field tag="%s">%s</field>'
            % (tag, "".join(f"<item>{escape(it)}</item>" for it in items))
            for tag, items in wos_record_fields(i, n_total)
        )
        recs.append(f"<REC>{fs}</REC>")
    return '<?xml version="1.0" encoding="UTF-8"?><records>' + "".join(
        recs
    ) + "</records>"


def export_payload(i: int, n_total: int) -> str:
    """Full export file payload for url i: header + record + trailer."""
    return (
        "FN Clarivate Analytics Web of Science\nVR 1.0\n"
        + wos_record(i, n_total)
        + "\n\nEF\n"
    )
