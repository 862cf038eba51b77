"""Training harness for the hashed char-n-gram language classifier.

Public fastText-style technique (Joulin et al. 2016; Cavnar & Trenkle
1994 n-gram LM): character trigrams, feature-hashed into a small bucket
table, scored by a multinomial Naive Bayes linear model.  The model is
trained IN-REPO on seeded synthetic corpora generated from small
common-word lists (public knowledge) — no external data — and the
learned weights are quantized to INTEGERS (log-prob * 1000) so that
document scores are exact integer sums: bit-identical between Spark,
DuckDB, and this pure-python trainer regardless of float summation
order.

The gram/bucket extraction contract shared by all three engines:

    padded  = " " + text + " "            (char-based, UTF-8 strings)
    grams   = padded[i : i+3]  for i in 0 .. max(len(padded)-3, 0)
    bucket  = int(md5(gram.utf8)[:4 hex], 16) % N_BUCKETS

``python tools/train_langid.py`` regenerates
``motive_spark/datapipe/langid_model.py``.
"""

from __future__ import annotations

import hashlib
import random

N_BUCKETS = 256
QUANT = 1000

# small common-word lists per language (public knowledge); the synthetic
# corpora are sampled from these, the classifier learns their CHARACTER
# trigram statistics (not the words themselves)
WORD_LISTS: dict[str, list[str]] = {
    "en": (
        "the and of to in is you that it he was for on are as with his "
        "they be at one have this from or had by word but what some we "
        "can out other were all there when up use your how said an each "
        "she which do their time if will way about many then them write "
        "would like so these her long make thing see him two has look"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem "
        "nicht ein eine als auch es an werden aus er hat dass sie nach "
        "wird bei einer um am sind noch wie einem über einen so zum war "
        "haben nur oder aber vor zur bis mehr durch man sein wurde sei"
    ).split(),
    "fr": (
        "le de un être et à il avoir ne je son que se qui ce dans en du "
        "elle au pour pas vous par sur faire plus dire me on mon lui "
        "nous comme mais ou si leur y dit tout alors sans deux même "
        "savoir voir quelque avec tous cette là rien encore mes temps"
    ).split(),
    "es": (
        "el la de que y a en un ser se no haber por con su para como "
        "estar tener le lo todo pero más hacer o poder decir este ir "
        "otro ese si me ya ver porque dar cuando él muy sin vez mucho "
        "saber qué sobre mi alguno mismo yo también hasta año dos"
    ).split(),
    "it": (
        "il di che e la a un essere per in una mi sono ho non lo ha le "
        "si con cosa io come ci questo qui hai del bene tu ma se sei "
        "nel mia sta molto ne anche chi era perché due fare quando "
        "della più ora lei questa così loro tutto tempo alla da"
    ).split(),
    "pt": (
        "o de a e que do da em um para é com não uma os no se na por "
        "mais as dos como mas foi ao ele das tem à seu sua ou ser "
        "quando muito há nos já está eu também só pelo pela até isso "
        "ela entre era depois sem mesmo aos ter seus quem nas me"
    ).split(),
    "nl": (
        "de het een van ik te dat die in en zij hij niet zijn is was op "
        "aan met als voor had er maar om hem dan zou of wat mijn men "
        "dit zo door over ze zich bij ook tot je mij uit der daar haar "
        "naar heb hoe heeft hebben deze want nog zal me zij uw"
    ).split(),
    "sv": (
        "och det att i en jag hon som han på den med var sig för så "
        "till är men ett om hade de av icke mig du henne då sin nu har "
        "inte hans honom skulle hennes där min man ej vid kunde något "
        "från ut när efter upp vi dem vara vad över än dig kan sina"
    ).split(),
}

LANGS = sorted(WORD_LISTS)


def gram_bucket(gram: str, n_buckets: int = N_BUCKETS) -> int:
    """md5-hashed feature bucket — the same 4-hex-digit prefix trick the
    Spark (conv(substring(md5, 1, 4), 16, 10)) and DuckDB
    (('0x' || substr(md5, 1, 4))::BIGINT) sides compute."""
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:4], 16) % n_buckets


def doc_buckets(text: str, n_buckets: int = N_BUCKETS) -> list[int]:
    padded = " " + text + " "
    n = max(len(padded) - 2, 1)
    return [gram_bucket(padded[i : i + 3], n_buckets) for i in range(n)]


def synthetic_docs(lang: str, n_docs: int, seed: int) -> list[str]:
    """Seeded corpus: i.i.d. common-word sentences, 20-60 words."""
    # hash-derived stream seed (str.__hash__ is process-randomized; md5
    # keeps the corpus reproducible across runs)
    rng = random.Random(
        int(hashlib.md5(f"{seed}|{lang}".encode()).hexdigest()[:8], 16)
    )
    words = WORD_LISTS[lang]
    return [
        " ".join(rng.choice(words) for _ in range(rng.randint(20, 60)))
        for _ in range(n_docs)
    ]


def train(
    n_docs_per_lang: int = 400, seed: int = 13, n_buckets: int = N_BUCKETS
) -> dict[str, list[int]]:
    """Multinomial NB with Laplace smoothing, weights quantized to
    int(round(log P(bucket | lang) * QUANT)).  Balanced classes, so the
    prior cancels and is omitted from scoring."""
    import math

    weights: dict[str, list[int]] = {}
    for lang in LANGS:
        counts = [0] * n_buckets
        total = 0
        for doc in synthetic_docs(lang, n_docs_per_lang, seed):
            for b in doc_buckets(doc, n_buckets):
                counts[b] += 1
                total += 1
        weights[lang] = [
            int(round(math.log((c + 1) / (total + n_buckets)) * QUANT))
            for c in counts
        ]
    return weights


def py_score(text: str, weights: dict[str, list[int]]) -> str:
    """Pure-python argmax scorer (the trainer-side oracle): earliest
    lang in sorted order wins ties — the exact fold the Spark and
    DuckDB sides implement."""
    bk = doc_buckets(text)
    best, best_s = None, None
    for lang in sorted(weights):
        s = sum(weights[lang][b] for b in bk)
        if best_s is None or s > best_s:
            best, best_s = lang, s
    return best
