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


def _entity(idx: int) -> dict:
    """Deterministic attributes of planted entity #idx."""
    rng = random.Random(10_000 + idx)
    surname = SURNAMES[idx % len(SURNAMES)]
    given = GIVEN[(idx // len(SURNAMES)) % len(GIVEN)]
    # Entities colliding on (surname, given) — every len(SURNAMES)*len(GIVEN)
    # indices — get distinct life dates + topics: the hard-negative twins.
    birth = 1500 + (idx * 37) % 400
    death = birth + 30 + (idx * 13) % 50
    topic = TOPICS[idx % len(TOPICS)]
    place = PLACES[(idx * 7) % len(PLACES)]
    return {
        "entity_id": idx,
        "name": f"{surname}, {given}",
        "birth": birth,
        "death": death,
        "topic": topic,
        "place": place,
        "rng_seed": rng.randint(0, 1 << 30),
    }


def _record_for(entity: dict, variant: int) -> dict:
    """Deterministic record #variant of an entity (a library catalog row
    rendered into a web page)."""
    rng = random.Random(entity["rng_seed"] * 1000 + variant)
    yv = _year_variants(entity["birth"], entity["death"])
    # ~20% of variants omit life dates entirely
    if variant % 5 == 4:
        person = entity["name"]
    else:
        person = f"{entity['name']}, {yv[variant % len(yv)]}"
    topic = entity["topic"]
    title_words = [topic[variant % len(topic)], topic[(variant + 1) % len(topic)]]
    title = f"The {title_words[0]} {title_words[1]} of {entity['name'].split(',')[0]}"
    year = entity["birth"] + 20 + variant
    provision = None if rng.random() < 0.013 else f"{entity['place']}: Printer & Sons, {year}"
    subjects = (
        None
        if rng.random() < 0.14
        else "--".join(s.capitalize() for s in rng.sample(topic, 3))
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
                     negatives_per_entity: int = 6) -> pd.DataFrame:
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
        # hard negatives: the name twin if present, else neighbor entities
        twin = eid + twin_stride if eid + twin_stride in by_entity else None
        negs = 0
        candidates = ([twin] if twin is not None else []) + [
            e for e in (eid + 1, eid + 2, eid + 3) if e in by_entity
        ]
        for other in candidates:
            if negs >= negatives_per_entity:
                break
            other_ids = by_entity[other]
            for l in ids[:2]:
                r = other_ids[rng.randrange(len(other_ids))]
                a, b = sorted((l, r))
                pairs.append((a, b, False))
                negs += 1
    pdf = pd.DataFrame(pairs, columns=["left", "right", "match"])
    return pdf.drop_duplicates(subset=["left", "right"], keep="first").reset_index(drop=True)
