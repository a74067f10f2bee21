"""Deterministic synthetic fixture generator.

Produces the Common-Crawl-style `pages` table of BASELINE.json:input_hint
(url, warc_ts, html, text, lang) whose text embeds catalog-like fields, plus
the labeled ground-truth pair set (FIXTURES.md §1-3).  Everything is seeded;
same seed + same n ⇒ byte-identical tables at any parallelism (generation is
keyed on absolute record index, so a distributed `mapInPandas` build equals
the driver-side pandas build row-for-row).

The generator plants K entity clusters with person-name variants exercising
all 15 birth/death regex patterns (reference birth_death_regexes.py:28-70)
and "Franz Schubert problem" hard negatives — distinct entities sharing a
normalized name but differing in life dates and title vocabulary
(reference README.md:57-72).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import itertools
import random

import pandas as pd

SURNAMES = [
    "Schubert", "Müller", "Smith", "García", "Dubois", "Rossi", "Kowalski",
    "Yamamoto", "Nagy", "Johansson", "Silva", "Novák", "Peters", "Brown",
    "Ivanov", "Okafor", "Haddad", "Lindqvist", "Moreau", "Castellanos",
]
GIVEN = [
    "Franz", "Anna", "John", "María", "Pierre", "Giulia", "Jan", "Kenji",
    "Eszter", "Erik", "Luiza", "Pavel", "Wilhelm", "Mary", "Dmitri",
    "Chinwe", "Layla", "Astrid", "Claire", "Diego",
]
TOPICS = [
    ["symphony", "lieder", "quartet", "sonata", "winterreise"],
    ["botany", "flora", "taxonomy", "herbarium", "orchids"],
    ["navigation", "cartography", "voyages", "atlas", "meridian"],
    ["theology", "sermons", "liturgy", "psalms", "epistles"],
    ["mechanics", "dynamics", "treatise", "equations", "celestial"],
    ["poetry", "elegies", "ballads", "verses", "odes"],
    ["medicine", "anatomy", "surgery", "pathology", "physiology"],
    ["law", "statutes", "commentaries", "jurisprudence", "digest"],
    ["painting", "frescoes", "portraits", "engravings", "studies"],
    ["philosophy", "ethics", "metaphysics", "dialogues", "critique"],
]
PLACES = [
    "Wien", "Leipzig", "London", "Paris", "Madrid", "Roma", "Kraków",
    "Kyoto", "Budapest", "Uppsala", "Lisboa", "Praha", "Boston", "Oxford",
]
ROLES = ["Contributor", "Subject", "Author", "Editor", "Translator"]
LANGS = ["en", "de", "fr", "es", "it", "pl"]

# Year-format variants: each renders (birth, death) into a person-suffix
# covering the reference's 15 regex patterns (FIXTURES.md §3).
def _year_variants(b: int, d: int) -> list[str]:
    return [
        f"{b}-{d}",
        f"{b}–{d}",                      # en-dash
        f"approximately {b}-{d}",
        f"ca. {b}-{d}",
        f"{b} - approximately {d}",
        f"({b}-{d})",
        f"b. {b}",
        f"fl. {b}-{d}",
        f"{b}-{d}.",
        f"{b} or {b % 10 + 1}-{d}",
    ]


_SYLLABLES = [
    "ka", "lor", "vin", "ta", "mu", "res", "po", "zan", "bel", "dra",
    "fi", "gos", "hul", "jen", "kro", "lim", "nor", "pex", "qua", "rud",
]


def _pseudo_words(idx: int, n: int = 4) -> list[str]:
    """Deterministic per-entity rare tokens (3-syllable pseudo-Latin), the
    distinctive vocabulary that makes an entity's works recognizably *its*
    works — what real subject headings / work titles do for real persons.
    Without these, every composite is dominated by shared template
    boilerplate and cosine margins collapse."""
    rng = random.Random(idx * 77 + 5)
    return [
        "".join(rng.choice(_SYLLABLES) for _ in range(3)) for _ in range(n)
    ]


def _entity(idx: int) -> dict:
    """Deterministic attributes of planted entity #idx."""
    rng = random.Random(10_000 + idx)
    surname = SURNAMES[idx % len(SURNAMES)]
    given = GIVEN[(idx // len(SURNAMES)) % len(GIVEN)]
    # Entities colliding on (surname, given) — every len(SURNAMES)*len(GIVEN)
    # indices — get distinct life dates + topics: the hard-negative twins.
    # birth/death must differ between name twins (idx vs idx+400: 400·37 ≡ 0
    # mod 400 would alias them — hence the twin_gen term): same-name entities
    # differ in life dates AND vocabulary, per FIXTURES.md §3
    twin_gen = idx // (len(SURNAMES) * len(GIVEN))
    birth = 1500 + (idx * 37 + 101 * twin_gen) % 400
    death = birth + 30 + (idx * 13 + 7 * twin_gen) % 50
    topic = TOPICS[(idx + 3 * twin_gen) % len(TOPICS)]
    place = PLACES[(idx * 7 + twin_gen) % len(PLACES)]
    return {
        "entity_id": idx,
        "name": f"{surname}, {given}",
        "birth": birth,
        "death": death,
        "topic": topic,
        "words": _pseudo_words(idx),
        "place": place,
        "rng_seed": rng.randint(0, 1 << 30),
    }


def _record_for(entity: dict, variant: int) -> dict:
    """Deterministic record #variant of an entity (a library catalog row
    rendered into a web page)."""
    rng = random.Random(entity["rng_seed"] * 1000 + variant)
    yv = _year_variants(entity["birth"], entity["death"])
    # Degradations are deterministic and NON-overlapping: a record loses at
    # most one signal (life dates OR subjects OR canonical title OR
    # provision), mirroring real catalogs where records are partially — not
    # simultaneously — sparse.  Stacked-degradation records would make the
    # planted truth unrecoverable by the shared feature battery and void the
    # F1≥0.99 criterion (FIXTURES.md §3).
    dateless = variant % 5 == 4
    secondary_title = variant % 5 == 2
    drop_subjects = variant % 5 == 3
    drop_provision = variant % 5 == 1 and rng.random() < 0.065  # ~1.3% overall
    person = entity["name"] if dateless else f"{entity['name']}, {yv[variant % len(yv)]}"
    topic = entity["topic"]
    words = entity["words"]
    # every title carries the entity's distinctive vocabulary
    if secondary_title:
        # secondary works still share the entity's lead word (real catalogs:
        # "Winterreise" vs "Winterreise arrangements") — a fully disjoint
        # title would make the pair unrecoverable for ANY content-based
        # matcher, reference included
        title_words = [words[0], topic[variant % len(topic)], words[3]]
    else:
        title_words = [words[0], topic[0], words[1]]
    title = f"The {title_words[0]} {title_words[1]} {title_words[2]} of {entity['name'].split(',')[0]}"
    year = entity["birth"] + 20 + variant
    provision = None if drop_provision else f"{entity['place']}: Printer & Sons, {year}"
    # subjects: entity-stable heading list (same headings, fixed order)
    subjects = (
        None
        if drop_subjects
        else "--".join(
            s.capitalize() for s in (topic[0], topic[1], words[0], words[1])
        )
    )
    roles = ROLES[variant % len(ROLES)]
    record_id = f"{entity['entity_id']}#Agent{700 + variant % 3}-{variant}"
    return {
        "record_id": record_id,
        "person": person,
        "roles": roles,
        "title": title,
        "provision": provision,
        "subjects": subjects,
    }


def _composite(rec: dict) -> str:
    """Labeled concatenation of non-null fields (reference composite format,
    visible in data/input/training_dataset.csv rows / FIXTURES.md §2)."""
    parts = [f"Contributor: {rec['person']}", f"Title: {rec['title']}"]
    parts.append(f"Attribution: {rec['roles']}")
    if rec["subjects"]:
        parts.append(f"Subjects: {rec['subjects']}")
    if rec["provision"]:
        parts.append(f"Provision information: {rec['provision']}")
    return "\n".join(parts)


_HTML_TEMPLATE = (
    "<html><head><title>{title}</title></head><body>"
    '<h1 class="person">{person}</h1>'
    '<div class="roles">{roles}</div>'
    '<div class="work">{title}</div>'
    '<div class="provision">{provision}</div>'
    '<div class="subjects">{subjects}</div>'
    "</body></html>"
)


def page_for_index(i: int, records_per_entity: int = 5) -> dict:
    """Fully deterministic page row for absolute record index i."""
    entity = _entity(i // records_per_entity)
    rec = _record_for(entity, i % records_per_entity)
    text = _composite(rec)
    html = _HTML_TEMPLATE.format(
        title=rec["title"],
        person=rec["person"],
        roles=rec["roles"],
        provision=rec["provision"] or "NULL",
        subjects=rec["subjects"] or "NULL",
    ).encode("utf-8")
    h = hashlib.md5(rec["record_id"].encode()).hexdigest()[:10]
    url = f"https://catalog.example.org/rec/{h}/{rec['record_id'].replace('#', '_')}"
    ts = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * 61)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html,
        "text": text,
        "lang": LANGS[i % len(LANGS)],
        # carried for ground-truth construction only (dropped from pages):
        "_record_id": rec["record_id"],
        "_entity_id": entity["entity_id"],
    }


def pages_pdf(n_records: int, records_per_entity: int = 5) -> pd.DataFrame:
    """Driver-side pandas build (tests, small fixtures)."""
    rows = [page_for_index(i, records_per_entity) for i in range(n_records)]
    return pd.DataFrame(rows)


def pages_df(spark, n_records: int, records_per_entity: int = 5, partitions: int = 8):
    """Distributed build: mapInPandas over spark.range — each partition
    renders its own index span, so output is identical at any parallelism."""
    from .schemas import PAGES

    def render(batches):
        for pdf in batches:
            out = pd.DataFrame(
                [page_for_index(int(i), records_per_entity) for i in pdf["id"]]
            )
            yield out[["url", "warc_ts", "html", "text", "lang"]]

    return (
        spark.range(0, n_records, numPartitions=partitions)
        .mapInPandas(render, schema=PAGES)
    )


def ground_truth_pdf(n_records: int, records_per_entity: int = 5,
                     negatives_per_entity: int = 20) -> pd.DataFrame:
    """Labeled pairs (left, right, match) per FIXTURES.md §3: all
    within-cluster positives + hard negatives against the name-twin entity
    (same normalized name, different dates/topics) + random negatives."""
    rows = [page_for_index(i, records_per_entity) for i in range(n_records)]
    by_entity: dict[int, list[str]] = {}
    for r in rows:
        by_entity.setdefault(r["_entity_id"], []).append(r["_record_id"])
    twin_stride = len(SURNAMES) * len(GIVEN)  # entities idx and idx+stride share a name
    rng = random.Random(777)
    pairs = []
    entity_ids = sorted(by_entity)
    for eid in entity_ids:
        ids = by_entity[eid]
        for l, r in itertools.combinations(sorted(ids), 2):
            pairs.append((l, r, True))
        # hard negatives: the name twin if present, plus neighbor entities,
        # plus random cross-entity pairs (easy negatives — the bulk of any
        # real labeled set, and what gives GD enough updates per epoch)
        twin = eid + twin_stride if eid + twin_stride in by_entity else None
        negs = 0
        # Hard-negative candidates, hardest first: the exact name twin, then
        # same-surname cousins (entity idx ± k·len(SURNAMES) shares the
        # surname; +80 also shares topic and place — the "two Peters writing
        # navigation books in Wien" case that otherwise only appears
        # unlabeled at prediction time), then neighbors.
        ns = len(SURNAMES)
        same_surname = [
            e
            for e in (eid + ns, eid + 2 * ns, eid + 4 * ns, eid - ns, eid - 4 * ns)
            if e in by_entity and e != eid
        ]
        candidates = ([twin] if twin is not None else []) + same_surname + [
            e for e in (eid + 1, eid + 2, eid + 3) if e in by_entity
        ]
        while negs < negatives_per_entity:
            if candidates:
                other = candidates.pop(0)
            else:
                other = entity_ids[rng.randrange(len(entity_ids))]
                if other == eid:
                    continue
            other_ids = by_entity[other]
            # cycle lefts over ALL record variants (incl. the dateless one —
            # dateless×dateless cousin pairs are the hardest negative class
            # and must appear in training, not only at prediction time)
            for l in (ids[negs % len(ids)], ids[(negs + 3) % len(ids)])[: 2 if negs < 8 else 1]:
                r = other_ids[rng.randrange(len(other_ids))]
                a, b = sorted((l, r))
                pairs.append((a, b, False))
                negs += 1
    pdf = pd.DataFrame(pairs, columns=["left", "right", "match"])
    return pdf.drop_duplicates(subset=["left", "right"], keep="first").reset_index(drop=True)
