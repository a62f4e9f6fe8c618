"""Deterministic synthetic web-page corpus with ground-truth entity clusters.

Implements FIXTURES.md §1-2: K synthetic entities, each yielding a cluster
of 3-10 near-duplicate pages (seeded perturbations: case flips, accents,
curly quotes «“‘„»”’, hyphenation, whitespace noise, sentence reordering,
≤10% token dropout, trailing-parenthetical titles) plus distractor
singleton pages that share blocking keys but not entities. Everything is
seeded (default 42) and pure-function deterministic; no external data.

Output tables:
- ``pages(url, warc_ts, html, text, lang)``  — exactly the BASELINE.json
  input_hint schema. ``text`` is the ground-truth extraction of ``html``
  (the byte-identical contract for ``extract.extract_text``).
- ``labeled_pairs(url_a, url_b, label)``     — positives exhaustive within
  clusters; negatives are cross-entity pairs sharing ≥1 blocking key
  (host or 4-token prefix), per the "F1 at fixed blocking key" metric.

Perturbation inventory mirrors the tokenizer hazards the reference patches
(quote characters and hyphen splitting, /root/reference/src/parsers.py:10-34)
and the title cleanup rule (/root/reference/src/simple_dataset.py:27-28).
"""

from __future__ import annotations

import html as html_mod
import random
from dataclasses import dataclass
from datetime import datetime, timedelta

_VOCAB = [
    # deterministic word pool (no external data): product-ish/NL-ish tokens
    f"{a}{b}"
    for a in (
        "dat", "net", "sol", "ver", "mar", "tek", "lum", "cor", "fab", "gen",
        "hol", "jun", "kal", "lin", "mon", "nor", "opt", "pan", "qua", "rig",
        "sen", "tor", "uni", "vel", "wex", "xan", "yor", "zet", "arb", "bran",
    )
    for b in (
        "ara", "eron", "ium", "ovia", "ex", "antis", "oria", "une", "atic",
        "els", "on", "ary", "ine", "or", "ust",
    )
]
_COMMON = [
    "the", "company", "provides", "services", "for", "customers", "in",
    "global", "markets", "and", "offers", "products", "with", "support",
    "team", "based", "of", "leading", "solutions", "platform",
]
_HOSTS = [
    "alpha-news.example.com", "beta-press.example.org", "gamma-wiki.example.net",
    "delta-blog.example.com", "epsilon-hub.example.org", "zeta-portal.example.net",
    "eta-digest.example.com", "theta-index.example.org",
]
_LANGS = ["en", "en", "en", "en", "de"]  # mostly en per FIXTURES

_EPOCH = datetime(2024, 3, 1, 0, 0, 0)


@dataclass
class Page:
    url: str
    warc_ts: datetime
    html: str
    text: str
    lang: str
    entity_id: int  # ground truth (-1 = distractor singleton)


def _entity_tokens(rng: random.Random, eid: int) -> tuple[str, list[str]]:
    """Entity name + distinctive description tokens."""
    name = f"{rng.choice(_VOCAB).capitalize()} {rng.choice(_VOCAB).capitalize()}"
    # distinctive content words + a unique slug token make clusters separable
    body = rng.sample(_VOCAB, 12) + [f"ent{eid}slug"]
    return name, body


def _sentences(rng: random.Random, name: str, body: list[str]) -> list[str]:
    sents = []
    words = list(body)
    rng.shuffle(words)
    for i in range(3):
        chunk = words[i * 4: i * 4 + 4]
        common = rng.sample(_COMMON, 4)
        s = " ".join(
            [name if i == 0 else common[0]]
            + [w for pair in zip(chunk, common[1:]) for w in pair]
            + chunk[len(common) - 1:]
        )
        sents.append(s[0].upper() + s[1:] + ".")
    return sents


_ACCENT_MAP = str.maketrans({"a": "á", "e": "é", "o": "ö", "u": "ü", "n": "ñ"})


def _perturb(rng: random.Random, sents: list[str]) -> list[str]:
    out = []
    order = list(range(len(sents)))
    if rng.random() < 0.5:
        rng.shuffle(order)
    for i in order:
        words = sents[i].split()
        kept = []
        for w in words:
            r = rng.random()
            if r < 0.06:
                continue  # token dropout ≤10%
            if r < 0.12:
                w = w.upper() if rng.random() < 0.5 else w.lower()
            elif r < 0.16:
                w = w.translate(_ACCENT_MAP)  # accent noise
            elif r < 0.20 and len(w) > 6:
                cut = len(w) // 2
                w = w[:cut] + "-" + w[cut:]  # hyphenation
            elif r < 0.24:
                w = "“" + w + "”" if rng.random() < 0.5 else "«" + w + "»"
            kept.append(w)
        out.append(" ".join(kept))
    return out


def _page_html(title: str, paragraphs: list[str]) -> tuple[str, str]:
    """Render page html + its ground-truth extraction.

    The extraction contract (see ``extract.extract_text``): title line,
    then each <p> paragraph, joined by '\\n'. nav/footer/script content is
    boilerplate the extractor must strip.
    """
    esc = html_mod.escape
    body_ps = "\n".join(f"    <p>{esc(p)}</p>" for p in paragraphs)
    page = (
        "<html>\n<head>\n"
        f"  <title>{esc(title)}</title>\n"
        "  <script>var t = 1 < 2;</script>\n"
        "</head>\n<body>\n"
        "  <nav>Home | About | Contact</nav>\n"
        "  <div>\n"
        f"{body_ps}\n"
        "  </div>\n"
        "  <footer>&copy; 2024 Example Media. All rights reserved.</footer>\n"
        "</body>\n</html>"
    )
    text = "\n".join([title] + paragraphs)
    return page, text


def generate_pages(
    n_entities: int = 30,
    distractors_per_entity: float = 1.5,
    seed: int = 42,
) -> tuple[list[Page], list[tuple[str, str, int]]]:
    """→ (pages, labeled_pairs). Deterministic in (n_entities, seed)."""
    rng = random.Random(seed)
    pages: list[Page] = []
    openers: list[list[str]] = []  # 4-token boilerplate openers (shared pfx)
    for _ in range(max(4, n_entities // 8)):
        openers.append(rng.sample(_COMMON, 4))

    for eid in range(n_entities):
        name, body = _entity_tokens(rng, eid)
        base_sents = _sentences(rng, name, body)
        opener = rng.choice(openers)
        n_pages = rng.randint(3, 10)
        host = rng.choice(_HOSTS)
        for p in range(n_pages):
            sents = _perturb(rng, base_sents) if p else list(base_sents)
            title = name if rng.random() < 0.7 else f"{name} (official site)"
            paragraphs = [" ".join(opener).capitalize() + "."] + sents
            page_host = host if rng.random() < 0.5 else rng.choice(_HOSTS)
            url = f"https://{page_host}/e{eid}/p{p}"
            html_s, text = _page_html(title, paragraphs)
            ts = _EPOCH + timedelta(seconds=len(pages) * 37)
            pages.append(
                Page(url, ts, html_s, text, rng.choice(_LANGS), eid)
            )

    n_distract = int(n_entities * distractors_per_entity)
    for d in range(n_distract):
        rng2 = rng  # same stream, still deterministic
        name = f"{rng2.choice(_VOCAB).capitalize()} {rng2.choice(_VOCAB).capitalize()}"
        body = rng2.sample(_VOCAB, 12) + [f"dis{d}slug"]
        sents = _sentences(rng2, name, body)
        opener = rng2.choice(openers)  # shares pfx block with real entities
        paragraphs = [" ".join(opener).capitalize() + "."] + sents
        url = f"https://{rng2.choice(_HOSTS)}/d{d}"
        html_s, text = _page_html(name, paragraphs)
        ts = _EPOCH + timedelta(seconds=len(pages) * 37)
        pages.append(Page(url, ts, html_s, text, rng2.choice(_LANGS), -1))

    labeled = _labeled_pairs(pages, rng)
    return pages, labeled


def _labeled_pairs(
    pages: list[Page], rng: random.Random
) -> list[tuple[str, str, int]]:
    """Positives: all within-cluster pairs. Negatives: cross-entity pairs
    sharing a blocking key (host or opener-paragraph prefix)."""
    by_entity: dict[int, list[Page]] = {}
    for pg in pages:
        by_entity.setdefault(pg.entity_id, []).append(pg)

    pairs: list[tuple[str, str, int]] = []
    for eid, members in by_entity.items():
        if eid < 0:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = sorted([members[i].url, members[j].url])
                pairs.append((a, b, 1))

    # negatives sharing ≥1 blocking key
    def host(u: str) -> str:
        return u.split("/")[2]

    def opener(p: Page) -> str:
        return p.text.split("\n")[1] if "\n" in p.text else ""

    by_key: dict[str, list[Page]] = {}
    for pg in pages:
        by_key.setdefault("h:" + host(pg.url), []).append(pg)
        by_key.setdefault("o:" + opener(pg), []).append(pg)
    seen = set()
    for key, members in by_key.items():
        if len(members) < 2:
            continue
        idx = list(range(len(members)))
        rng.shuffle(idx)
        for i, j in zip(idx[::2], idx[1::2]):
            a, b = members[i], members[j]
            if a.entity_id == b.entity_id and a.entity_id >= 0:
                continue
            ua, ub = sorted([a.url, b.url])
            if (ua, ub) in seen:
                continue
            seen.add((ua, ub))
            pairs.append((ua, ub, 0))
    return pairs


def write_parquet(
    out_dir: str,
    n_entities: int = 30,
    seed: int = 42,
) -> tuple[str, str]:
    """Write pages.parquet + labeled_pairs.parquet under ``out_dir``."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pages, labeled = generate_pages(n_entities=n_entities, seed=seed)
    pages_tbl = pa.table(
        {
            "url": [p.url for p in pages],
            "warc_ts": pa.array(
                [p.warc_ts for p in pages], type=pa.timestamp("us")
            ),
            "html": [p.html.encode("utf-8") for p in pages],
            "text": [p.text for p in pages],
            "lang": [p.lang for p in pages],
            "entity_id": [p.entity_id for p in pages],
        }
    )
    pairs_tbl = pa.table(
        {
            "url_a": [a for a, _, _ in labeled],
            "url_b": [b for _, b, _ in labeled],
            "label": pa.array([l for _, _, l in labeled], type=pa.int32()),
        }
    )
    pages_path = os.path.join(out_dir, "pages.parquet")
    pairs_path = os.path.join(out_dir, "labeled_pairs.parquet")
    # bounded row groups: a single-row-group file degenerates Spark's
    # byte-range splits into ONE effective reader task (observed: 1 task
    # doing 150s of work while 7 siblings read nothing)
    pq.write_table(pages_tbl, pages_path, row_group_size=8192)
    pq.write_table(pairs_tbl, pairs_path, row_group_size=65536)
    return pages_path, pairs_path
