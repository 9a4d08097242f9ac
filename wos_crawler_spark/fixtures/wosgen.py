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


def wos_record(i: int, n_total: int) -> str:
    """One complete field-tagged record for url index ``i``. Cited
    references point at other record indices (deterministic link
    structure mirrors fixtures ``links``)."""
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

    lines = ["PT J"]
    lines.append("AU " + f"{auths[0][0]}, {auths[0][1][0]}")
    for last, first in auths[1:]:
        lines.append(f"   {last}, {first[0]}")
    lines.append("AF " + f"{auths[0][0]}, {auths[0][1]}")
    for last, first in auths[1:]:
        lines.append(f"   {last}, {first}")
    # wrap long titles onto a continuation line (exercises P2)
    lines.append("TI " + " ".join(title_words[:4]))
    if len(title_words) > 4:
        lines.append("   " + " ".join(title_words[4:]))
    lines.append(f"SO {journal}")
    lines.append(f"LA {lang}")
    lines.append(f"DT {dt}")
    lines.append("DE " + "; ".join(kws))
    lines.append("ID " + "; ".join(kwp))
    lines.append("AB " + " ".join(abstract_words[:12]))
    if len(abstract_words) > 12:
        lines.append("   " + " ".join(abstract_words[12:]))
    first_c1 = (
        f"C1 [{auths[0][0]}, {auths[0][1]}] Univ {h(i, 12) % 50}, "
        f"Dept CS, City, Country."
    )
    lines.append(first_c1)
    for last, first in auths[1:]:
        lines.append(f"   [{last}, {first}] Univ {h(i, 13) % 50}, Dept IS, Town, Nation.")
    lines.append(
        f"RP {auths[0][0]}, {auths[0][1][0]} (reprint author), "
        f"Univ {h(i, 12) % 50}, Dept CS, City, Country."
    )
    if h(i, 14) % 3:
        ag = _AGENCIES[h(i, 15) % len(_AGENCIES)]
        lines.append(f"FU {ag} [G-{h(i, 16) % 1000}]")
        lines.append("FX The funding text.")
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
        lines.append("CR " + refs[0])
        for r in refs[1:]:
            lines.append("   " + r)
    lines.append(f"NR {n_refs}")
    lines.append(f"TC {h(i, 19) % 100}")
    lines.append(f"Z9 {h(i, 19) % 100}")
    lines.append(f"U1 {h(i, 20) % 10}")
    lines.append(f"U2 {h(i, 21) % 50}")
    lines.append("PU PUBLISHER")
    lines.append(f"SN {1000 + i % 9000:04d}-{1000 + h(i, 22) % 9000:04d}")
    lines.append(f"J9 {journal.split()[0][:8]}")
    lines.append(f"JI J. {journal.split()[0].title()}.")
    lines.append("PD FEB")
    lines.append(f"PY {year}")
    lines.append(f"VL {1 + h(i, 23) % 40}")
    lines.append(f"IS {1 + h(i, 24) % 12}")
    bp = 1 + h(i, 25) % 900
    lines.append(f"BP {bp}")
    lines.append(f"EP {bp + 10}")
    lines.append(f"DI 10.1000/rec{i:08d}")
    lines.append("PG 11")
    lines.append("WC " + "; ".join(sorted({_CATS[h(i, 26 + k) % len(_CATS)] for k in range(2)})))
    lines.append("SC " + _CATS[h(i, 27) % len(_CATS)].split(",")[0])
    lines.append(f"GA X{h(i, 28) % 100:02d}")
    lines.append(f"UT WOS:{i:015d}")
    lines.append("ER")
    return "\n".join(lines)


def export_payload(i: int, n_total: int) -> str:
    """Full export file payload for url i: header + record + trailer."""
    return (
        "FN Clarivate Analytics Web of Science\nVR 1.0\n"
        + wos_record(i, n_total)
        + "\n\nEF\n"
    )
