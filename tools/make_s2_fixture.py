"""Generate the deterministic S2 JSON-lines fixture at
fixtures/s2_corpus.jsonl (committed; regenerate with
``python tools/make_s2_fixture.py``).

Shape mirrors the Semantic Scholar corpus format the reference ingests
(S2JsonEntryReader.java): id/title/paperAbstract/entities/fieldsOfStudy/
authors[{name, ids[]}]/outCitations/journalName/sources/year/venue.
Deliberately exercises every branch of the reader's null handling:
missing keys, JSON nulls, empty arrays, empty strings, embedded
newlines, unicode (Greek) text, numeric-looking tokens.
"""

from __future__ import annotations

import json
import os
import random

N_DOCS = 300
OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "s2_corpus.jsonl")

WORDS = (
    "retrieval ranking index posting inverted spark shuffle partition "
    "catalyst tungsten corpus stemming tokenizer bm okapi vector cosine "
    "citation graph pagerank query latency throughput executor driver "
    "parquet iceberg snapshot manifest bucket salting skew broadcast "
    "semantic scholar paper abstract venue journal science computing"
).split()

GREEK = "ανάκτηση πληροφορίας ευρετήριο όρος κείμενο βαθμολογία".split()

FIELDS = ["Computer Science", "Medicine", "Biology", "Physics", "Mathematics"]
VENUES = ["SIGIR", "VLDB", "ICDE", "CIKM", "TREC", ""]
JOURNALS = ["JASIST", "TOIS", "Inf. Retr.", "IEEE TKDE", ""]
NAMES = ["Alice Zhang", "Bob Müller", "Γιώργος Παπάς", "Dana Smith",
         "Ehud Cohen", "Fatima Khan", "Grace O'Neil", "Hiro Tanaka"]


def sentence(rng: random.Random, lo: int, hi: int) -> str:
    n = rng.randint(lo, hi)
    toks = [rng.choice(WORDS) for _ in range(n)]
    if rng.random() < 0.15:
        toks.insert(rng.randrange(len(toks) + 1), rng.choice(GREEK))
    if rng.random() < 0.1:
        toks.insert(rng.randrange(len(toks) + 1), str(rng.randint(1, 9999)))
    return " ".join(toks)


def make_doc(rng: random.Random, i: int, all_ids: list[str]) -> dict:
    doc: dict = {"id": all_ids[i]}
    # title: 5% missing key, 5% null, 10% contains a newline
    r = rng.random()
    if r < 0.05:
        pass
    elif r < 0.10:
        doc["title"] = None
    else:
        t = sentence(rng, 3, 8).title()
        if rng.random() < 0.10:
            t = t.replace(" ", "\n", 1)
        doc["title"] = t
    r = rng.random()
    if r < 0.05:
        doc["paperAbstract"] = None
    elif r < 0.10:
        doc["paperAbstract"] = ""
    else:
        a = sentence(rng, 20, 60) + "."
        if rng.random() < 0.15:
            a = a.replace(" ", "\n", 2)
        doc["paperAbstract"] = a
    doc["entities"] = (
        None if rng.random() < 0.08
        else [rng.choice(WORDS).title() for _ in range(rng.randint(0, 4))]
    )
    doc["fieldsOfStudy"] = (
        None if rng.random() < 0.08
        else rng.sample(FIELDS, k=rng.randint(0, 2))
    )
    if rng.random() < 0.06:
        doc["authors"] = None
    else:
        doc["authors"] = [
            {
                "name": rng.choice(NAMES),
                "ids": (None if rng.random() < 0.1
                        else [str(rng.randint(10_000, 99_999_999))
                              for _ in range(rng.randint(0, 2))]),
            }
            for _ in range(rng.randint(0, 3))
        ]
    # citations point at other fixture ids; ~20% dangling (unknown target)
    n_cit = rng.randint(0, 6)
    cits = []
    for _ in range(n_cit):
        if rng.random() < 0.2:
            cits.append("dangling" + str(rng.randint(0, 999)).zfill(6))
        else:
            cits.append(all_ids[rng.randrange(len(all_ids))])
    doc["outCitations"] = cits if (cits or rng.random() < 0.5) else None
    doc["journalName"] = rng.choice(JOURNALS) if rng.random() > 0.1 else None
    doc["sources"] = ["DBLP"] if rng.random() < 0.4 else []
    if rng.random() < 0.12:
        doc["year"] = None
    else:
        doc["year"] = rng.randint(1980, 2020)
    doc["venue"] = rng.choice(VENUES) if rng.random() > 0.07 else None
    return doc


def main() -> None:
    rng = random.Random(20260816)
    all_ids = ["%040x" % rng.getrandbits(160) for _ in range(N_DOCS)]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        for i in range(N_DOCS):
            f.write(json.dumps(make_doc(rng, i, all_ids), ensure_ascii=False) + "\n")
    print(f"wrote {N_DOCS} docs to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
