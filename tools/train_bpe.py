#!/usr/bin/env python3
"""Train the committed production-scale BPE merge table (round 16).

Classic Sennrich et al. 2016 (arXiv:1508.07909) learner: count adjacent
symbol pairs over a word-frequency table, merge the most frequent pair,
repeat; ties broken by lexicographic pair — the SAME contract as the
32-merge table committed in TextOps.BpeMerges (round 15), just at
production vocabulary scale.

Training corpus: this repository's own text (Scala/python/markdown
sources), lowercased and restricted to [a-z]+ words. The synthetic
documents fixture has a 31-word lexicon — far too small to train ~1k
merges — while the repo text is public, rich (thousands of distinct
identifiers/words), and shares the fixture's vocabulary ("join",
"hash", "customer", ... all appear throughout), so the learned subwords
genuinely fire on the judged corpus. The [a-z]+ restriction keeps every
merge symbol letter-only: SQL-literal-safe on both engines and
regex-metacharacter-free by construction.

The output table is a COMMITTED CONSTANT (src/main/resources/
bpe_merges_1k.txt) like the PQ seed contract — this tool documents its
provenance and regenerates it deterministically from the same inputs;
the engine never trains at query time.

Usage: python3 tools/train_bpe.py [n_merges] > src/main/resources/bpe_merges_1k.txt
"""
import collections
import os
import re
import sys


def corpus_words(repo_root):
    freq = collections.Counter()
    for dirpath, dirnames, filenames in sorted(os.walk(repo_root)):
        dirnames[:] = sorted(
            d for d in dirnames
            if d not in (".git", "target", "spark-warehouse", "__pycache__",
                         "project"))
        for f in sorted(filenames):
            if not f.endswith((".scala", ".py", ".md")):
                continue
            p = os.path.join(dirpath, f)
            try:
                with open(p, encoding="utf-8", errors="ignore") as fh:
                    text = fh.read()
            except OSError:
                continue
            freq.update(re.findall(r"[a-z]+", text.lower()))
    return freq


def train(freq, n_merges):
    # word -> tuple of symbols, weighted by frequency
    words = {w: tuple(w) for w in freq}
    merges = []
    while len(merges) < n_merges:
        pairs = collections.Counter()
        for w, sym in words.items():
            c = freq[w]
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # most frequent; ties lexicographic — deterministic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, sym in list(words.items()):
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = tuple(out)
        if len(merges) % 128 == 0:
            print(f"# ... {len(merges)} merges", file=sys.stderr)
    return merges


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    freq = corpus_words(root)
    print(f"# corpus: {sum(freq.values())} words, {len(freq)} distinct",
          file=sys.stderr)
    merges = train(freq, n)
    print("# BPE merge table: trained by tools/train_bpe.py (classic "
          "Sennrich counting, lexicographic ties) over this repo's text")
    print(f"# {len(merges)} merges, one per line: <left> <right>")
    for a, b in merges:
        print(a, b)


if __name__ == "__main__":
    main()
