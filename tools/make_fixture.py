#!/usr/bin/env python
"""Generate the committed Multi-XScience fixture.

The container has zero network egress, so the HF `multi_x_science_sum`
dataset cannot be fetched at build time. This script deterministically
writes a ~200-example fixture with the REAL dataset schema
(aid, mid, abstract, related_work, ref_abstract{cite_N, mid, abstract})
and the real dataset's statistical quirks the pipeline must survive:

  * a shared pool of reference abstracts — the same reference is cited by
    several papers, so the MIPS-corpus explode→dedup→aggregate path
    (reference sotasum/data_loaders.py:39-95) actually merges rows;
  * empty reference abstracts (the real dataset has many "");
  * `@cite_N` markers in related_work (stripped to "cite" downstream) and
    occasional `@math` tokens;
  * multiple related-work sections per target paper aid (aggregated mode).

Text is template-generated scientific English — realistic in structure,
vocabulary distribution, and length (abstracts ~80-150 words), not random
word salad. Output: retrieval_augmented_mds_tpu/data/fixtures/
multi_x_science_200.json.gz
"""

import gzip
import json
import os
import random

TOPICS = [
    ("neural machine translation", "attention mechanisms", "BLEU",
     "encoder-decoder architectures", "subword segmentation"),
    ("multi-document summarization", "extractive salience models", "ROUGE",
     "hierarchical encoders", "redundancy reduction"),
    ("dense passage retrieval", "dual-encoder training", "recall@k",
     "hard negative mining", "approximate nearest neighbor search"),
    ("graph representation learning", "message passing networks", "node classification accuracy",
     "spectral convolutions", "neighborhood sampling"),
    ("question answering", "reading comprehension models", "exact match",
     "span extraction", "open-domain retrieval"),
    ("language model pretraining", "masked token objectives", "perplexity",
     "transformer scaling", "tokenization strategies"),
    ("scientific document understanding", "citation-aware embeddings", "MAP",
     "structure-aware encoders", "section classification"),
    ("long-context modeling", "sparse attention patterns", "throughput",
     "sliding-window kernels", "global token routing"),
    ("knowledge-grounded generation", "retrieval augmentation", "factuality scores",
     "non-parametric memories", "copy mechanisms"),
    ("contrastive representation learning", "InfoNCE objectives", "linear probe accuracy",
     "temperature scheduling", "in-batch negatives"),
    ("abstractive summarization", "pointer-generator networks", "ROUGE-L",
     "coverage penalties", "label smoothing"),
    ("entity linking", "candidate generation pipelines", "micro-F1",
     "mention detection", "knowledge base priors"),
]

OPENERS = [
    "Recent advances in {t} have been driven largely by {m}.",
    "We study the problem of {t}, focusing on the role of {m}.",
    "{T} has emerged as a central problem in natural language processing.",
    "Despite rapid progress, {t} remains challenging when supervision is scarce.",
    "This paper revisits {t} from the perspective of {m}.",
]

BODY = [
    "We propose a model that combines {m} with {s}, trained end-to-end on large weakly labeled corpora.",
    "Our approach decouples {s} from the scoring function, which allows the two components to be optimized independently.",
    "In contrast to prior work, we treat {s} as a latent variable and marginalize over it during training.",
    "We introduce an auxiliary objective that regularizes {m} toward sparser solutions, improving sample efficiency.",
    "A key ingredient is a curriculum over document length, which stabilizes optimization for {t}.",
    "The model is trained with a two-stage procedure: pretraining on in-domain text followed by task-specific fine-tuning.",
    "We further show that {s} can be distilled into a compact student model with negligible loss in quality.",
    "An ablation over {s} shows that most of the gain comes from better calibration of the output distribution.",
    "Unlike pipeline systems, our method propagates gradients through every stage, including {s}.",
    "We derive a closed-form approximation when the interaction term satisfies @math, which reduces inference cost substantially.",
]

RESULTS = [
    "Experiments on three standard benchmarks show consistent improvements of 1.4 to 3.2 points in {e} over strong baselines.",
    "On the largest evaluation set our method improves {e} by a relative 7 percent while using half the parameters.",
    "Human evaluation confirms the automatic results, with annotators preferring our outputs in 62 percent of cases.",
    "Our best configuration establishes a new state of the art in {e} on two of the four datasets considered.",
    "The approach scales to inputs an order of magnitude longer than previous systems without degradation in {e}.",
]

RW_OPENERS = [
    "Early work on {t} relied on feature-based pipelines @cite_1 @cite_2, which required extensive manual engineering.",
    "The study of {t} dates back to @cite_1 , who framed it as a structured prediction problem.",
    "A large body of work addresses {t} with neural architectures @cite_1 @cite_2 @cite_3 .",
    "{T} was first formulated in @cite_1 and has since been extended in several directions.",
]

RW_BODY = [
    "@cite_2 introduced {m} for this task, showing large gains when training data is plentiful.",
    "Building on this, @cite_3 combined {m} with {s}, which remains a strong baseline.",
    "More recently, @cite_4 proposed to learn {s} jointly with the downstream objective, improving {e}.",
    "Closest to our work, @cite_5 also exploits {s}; unlike them we do not assume access to gold alignments.",
    "@cite_6 scale this idea to web-sized corpora, although their method requires expensive preprocessing.",
    "Several authors have investigated the effect of {m} on robustness @cite_7 , reaching mixed conclusions.",
    "An orthogonal line of work studies efficiency: @cite_8 compress the model via quantization, while @cite_2 prune attention heads.",
    "Our method differs in that the memory component is non-parametric and refreshed during training, similar in spirit to @cite_4 .",
]


def _sent_pack(rng, pool, n, subs):
    picks = rng.sample(pool, min(n, len(pool)))
    return " ".join(p.format(**subs) for p in picks)


def _subs(topic):
    t, m, e, s, s2 = topic
    return dict(t=t, T=t.capitalize(), m=m, e=e, s=s, s2=s2)


def make_ref_abstract(rng, topic, j):
    subs = _subs(topic)
    return (
        _sent_pack(rng, OPENERS, 1, subs) + " "
        + _sent_pack(rng, BODY, 3 + j % 3, subs) + " "
        + _sent_pack(rng, RESULTS, 1, subs)
    )


def main(out_path, n_examples=200, n_ref_pool=120, seed=20260816):
    rng = random.Random(seed)
    # shared reference pool: (mid, abstract) — ~12% empty abstracts like
    # the real dataset
    pool = []
    for j in range(n_ref_pool):
        topic = TOPICS[j % len(TOPICS)]
        abstract = "" if rng.random() < 0.12 else make_ref_abstract(rng, topic, j)
        pool.append((f"ref-{1000 + j}", abstract, topic))

    records = []
    for i in range(n_examples):
        topic = TOPICS[i % len(TOPICS)]
        subs = _subs(topic)
        # cite 2-6 refs, biased toward same-topic pool entries
        same = [p for p in pool if p[2] == topic]
        k = rng.randint(2, 6)
        cited = rng.sample(same, min(len(same), max(1, k // 2)))
        cited += rng.sample(pool, k - len(cited))
        # dedup by mid, keep order
        seen, refs = set(), []
        for r in cited:
            if r[0] not in seen:
                seen.add(r[0])
                refs.append(r)

        abstract = (
            _sent_pack(rng, OPENERS, 1, subs) + " "
            + _sent_pack(rng, BODY, 4, subs) + " "
            + _sent_pack(rng, RESULTS, 2, subs)
        )
        rw = (
            _sent_pack(rng, RW_OPENERS, 1, subs) + " "
            + _sent_pack(rng, RW_BODY, 4 + i % 3, subs)
        )
        # renumber @cite_N to match this example's reference count
        for old, new in zip(range(1, 9), range(1, len(refs) + 1)):
            rw = rw.replace(f"@cite_{old}", f"@cite_{new}")

        records.append(
            {
                "aid": f"paper-{2000 + i // 2}",  # 2 rw-sections per aid →
                # aggregated mode merges (reference data_loaders.py:378-425)
                "mid": f"mxs-{i}",
                "abstract": abstract,
                "related_work": rw,
                "ref_abstract": {
                    "cite_N": [f"@cite_{j + 1}" for j in range(len(refs))],
                    "mid": [r[0] for r in refs],
                    "abstract": [r[1] for r in refs],
                },
            }
        )

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with gzip.open(out_path, "wt") as f:
        json.dump(records, f)
    print(f"wrote {len(records)} records to {out_path}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200,
                    help="number of examples (rw sections)")
    ap.add_argument("--pool", type=int, default=None,
                    help="shared reference-abstract pool size "
                    "(default 0.6*n, the 200-fixture ratio)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "retrieval_augmented_mds_tpu", "data", "fixtures",
        f"multi_x_science_{args.n}.json.gz"
        if args.n != 200 else "multi_x_science_200.json.gz",
    )
    main(out, n_examples=args.n,
         n_ref_pool=args.pool or max(120, int(args.n * 0.6)))
