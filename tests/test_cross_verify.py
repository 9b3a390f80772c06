"""Cross-verification: engine results vs a brute-force reference model.

Analog of the reference's e2e/tests/search/test_cross_verify.py (results
compared against MySQL): here the oracle is a direct Python scan applying
the same normalization + substring semantics over a randomized EN+JA corpus,
exercising AND/NOT/filters/boolean/fuzzy/CJK paths with verify_text on.
"""

import numpy as np
import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.query import QueryParser
from mygramdb_tpu.query.pipeline import SearchPipeline
from mygramdb_tpu.utils.edit_distance import contains_fuzzy_match

CFG = {
    "tables": [{
        "name": "t",
        "text_source": {"column": "content"},
        "filters": [
            {"name": "status", "type": "int", "bitmap_index": True},
            {"name": "score", "type": "double"},
        ],
    }],
    "memory": {"verify_text": "all"},
    "cache": {"enabled": False},
}

EN = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "quick",
      "brown", "search", "tensor"]
JA = ["日本語", "東京", "検索", "高速", "形態素", "漢字"]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(777)
    docs = {}
    for i in range(1, 1501):
        words = list(rng.choice(EN, size=int(rng.integers(3, 9))))
        if i % 4 == 0:
            words.extend(rng.choice(JA, size=int(rng.integers(1, 3))))
        text = " ".join(words)
        docs[i] = {
            "content": text,
            "status": int(rng.integers(0, 3)),
            "score": float(rng.integers(0, 100)) / 10,
        }
    return docs


@pytest.fixture(scope="module")
def engine(corpus):
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("t")
    for pk, d in corpus.items():
        ctx.add_row(str(pk), d["content"],
                    {"status": d["status"], "score": d["score"]})
    ctx.optimize()  # exercise the device path, not just the delta
    return SearchPipeline(ctx, cfg), ctx


P = QueryParser()


def oracle(corpus, ctx, require=(), forbid=(), status_eq=None,
           score_gte=None, fuzzy=None):
    """Brute-force: normalized substring semantics (verify_text=all)."""
    out = []
    for pk, d in corpus.items():
        text = ctx.normalize(d["content"])
        ok = all(ctx.normalize(r) in text for r in require)
        if ok and forbid:
            ok = not any(ctx.normalize(f) in text for f in forbid)
        if ok and fuzzy is not None:
            term, dist = fuzzy
            norm = ctx.normalize(term)
            ok = norm in text or contains_fuzzy_match(text, norm, dist)
        if ok and status_eq is not None:
            ok = d["status"] == status_eq
        if ok and score_gte is not None:
            ok = d["score"] >= score_gte
        if ok:
            out.append(pk)
    return sorted(out, reverse=True)


def run(pipe, line):
    out = pipe.execute(P.parse(line))
    assert out.success, out.error
    return out


class TestCrossVerify:
    def test_single_terms(self, engine, corpus):
        pipe, ctx = engine
        for term in EN + JA:
            out = run(pipe, f'SEARCH t "{term}" LIMIT 2000')
            exp = oracle(corpus, ctx, require=[term])
            got = out.results.tolist()
            assert out.total == len(exp), term
            assert got == exp, term

    def test_and_pairs(self, engine, corpus):
        pipe, ctx = engine
        rng = np.random.default_rng(1)
        for _ in range(10):
            a, b = rng.choice(EN, size=2, replace=False)
            out = run(pipe, f'SEARCH t "{a}" AND "{b}" LIMIT 2000')
            exp = oracle(corpus, ctx, require=[a, b])
            assert out.total == len(exp), (a, b)
            assert out.results.tolist() == exp, (a, b)

    def test_not(self, engine, corpus):
        pipe, ctx = engine
        for a, b in [("alpha", "beta"), ("quick", "日本語")]:
            out = run(pipe, f'SEARCH t "{a}" NOT "{b}" LIMIT 2000')
            exp = oracle(corpus, ctx, require=[a], forbid=[b])
            assert out.total == len(exp), (a, b)
            assert out.results.tolist() == exp, (a, b)

    def test_filters(self, engine, corpus):
        pipe, ctx = engine
        out = run(pipe, 'SEARCH t alpha FILTER status = 1 LIMIT 2000')
        exp = oracle(corpus, ctx, require=["alpha"], status_eq=1)
        assert out.results.tolist() == exp
        out = run(pipe, 'SEARCH t alpha FILTER score >= 5 LIMIT 2000')
        exp = oracle(corpus, ctx, require=["alpha"], score_gte=5.0)
        assert out.results.tolist() == exp

    def test_boolean_or(self, engine, corpus):
        pipe, ctx = engine
        out = run(pipe, 'SEARCH t alpha OR 東京 LIMIT 2000')
        exp_a = set(oracle(corpus, ctx, require=["alpha"]))
        exp_b = set(oracle(corpus, ctx, require=["東京"]))
        exp = sorted(exp_a | exp_b, reverse=True)
        assert out.total == len(exp)
        assert out.results.tolist() == exp

    def test_fuzzy(self, engine, corpus):
        pipe, ctx = engine
        out = run(pipe, 'SEARCH t alpah FUZZY 2 LIMIT 2000')
        exp = oracle(corpus, ctx, fuzzy=("alpah", 2))
        assert out.total == len(exp)
        assert out.results.tolist() == exp

    def test_count_parity(self, engine, corpus):
        pipe, ctx = engine
        for term in ["alpha", "日本語", "sigma"]:
            out = run(pipe, f'COUNT t "{term}"')
            assert out.total == len(oracle(corpus, ctx, require=[term]))

    def test_random_query_matrix(self, engine, corpus):
        """Property sweep: random combinations of AND terms / NOT /
        filters / sort column / pagination, full ordered-result parity
        against the oracle (reference cross-verify breadth)."""
        pipe, ctx = engine
        rng = np.random.default_rng(42)
        vocab = EN + JA
        for case in range(60):
            k = int(rng.integers(1, 3))
            require = list(rng.choice(vocab, size=k, replace=False))
            forbid = []
            if rng.random() < 0.3:
                forbid = [str(rng.choice([w for w in vocab
                                          if w not in require]))]
            status_eq = int(rng.integers(0, 3)) if rng.random() < 0.4 \
                else None
            score_gte = float(rng.integers(0, 80)) / 10 \
                if rng.random() < 0.3 else None
            limit = int(rng.choice([5, 37, 100, 2000]))
            offset = int(rng.choice([0, 0, 3, 11]))
            sort_status = rng.random() < 0.25
            desc = bool(rng.random() < 0.5)

            q = "SEARCH t " + " AND ".join(f'"{t}"' for t in require)
            for f in forbid:
                q += f' NOT "{f}"'
            if status_eq is not None:
                q += f" FILTER status = {status_eq}"
            if score_gte is not None:
                q += f" FILTER score >= {score_gte}"
            if sort_status:
                q += f" SORT status {'DESC' if desc else 'ASC'}"
            else:
                q += f" SORT id {'DESC' if desc else 'ASC'}"
            q += f" LIMIT {offset},{limit}" if offset else f" LIMIT {limit}"

            matched = oracle(corpus, ctx, require=require, forbid=forbid,
                             status_eq=status_eq, score_gte=score_gte)
            asc_ids = sorted(matched)
            if sort_status:
                # stable sort over ascending ids, NULLs last (none here)
                exp = [d for d in sorted(
                    asc_ids, key=lambda d: corpus[d]["status"],
                    reverse=desc)]
            else:
                exp = asc_ids[::-1] if desc else asc_ids
            exp = exp[offset:offset + limit]

            out = run(pipe, q)
            assert out.total == len(matched), q
            assert out.results.tolist() == exp, q

    def test_random_boolean_ast_matrix(self, engine, corpus):
        """Random boolean expression trees (NOT > AND > OR, parens) vs a
        recursive oracle over normalized-substring semantics — the
        reference's query_ast evaluation breadth."""
        pipe, ctx = engine
        rng = np.random.default_rng(7)
        vocab = EN + JA

        def gen(depth):
            r = rng.random()
            if depth >= 3 or r < 0.4:
                return ("term", str(rng.choice(vocab)))
            if r < 0.6:
                return ("and", gen(depth + 1), gen(depth + 1))
            if r < 0.85:
                return ("or", gen(depth + 1), gen(depth + 1))
            return ("not", gen(depth + 1))

        def to_str(node):
            if node[0] == "term":
                return f'"{node[1]}"'
            if node[0] == "not":
                return f"NOT ({to_str(node[1])})"
            op = node[0].upper()
            return f"({to_str(node[1])} {op} {to_str(node[2])})"

        def ev(node, text):
            if node[0] == "term":
                return ctx.normalize(node[1]) in text
            if node[0] == "not":
                return not ev(node[1], text)
            a, b = ev(node[1], text), ev(node[2], text)
            return (a and b) if node[0] == "and" else (a or b)

        checked = 0
        for _ in range(50):
            tree = gen(0)
            if tree[0] == "not" or tree[0] == "term":
                continue  # bare NOT / single term take non-AST paths
            expr = to_str(tree)
            out = run(pipe, f"SEARCH t {expr} LIMIT 2000")
            exp = sorted((pk for pk, d in corpus.items()
                          if ev(tree, ctx.normalize(d["content"]))),
                         reverse=True)
            assert out.total == len(exp), expr
            assert out.results.tolist() == exp, expr
            checked += 1
        assert checked >= 25

    def test_facet_counts_parity(self, engine, corpus):
        """FACET aggregation vs a brute-force Counter over oracle-matched
        docs, with and without a search restriction."""
        from collections import Counter
        pipe, ctx = engine
        P2 = QueryParser()
        for term in ["alpha", "日本語", None]:
            if term is None:
                matched = list(corpus)
            else:
                matched = oracle(corpus, ctx, require=[term])
            expected = Counter(str(corpus[d]["status"]) for d in matched)
            q = P2.parse(f'FACET t status "{term}"' if term
                         else "FACET t status")
            out = pipe.execute(q, collect_all=True)
            assert out.success, out.error
            ids = out.results
            got = Counter()
            fi = ctx.filter_index
            for v, c in fi.value_counts(
                    "status", ids.astype(np.int64) if term else None):
                got[v] = c
            assert got == expected, term

    def test_mutation_then_verify(self, engine, corpus):
        pipe, ctx = engine
        ctx.add_row("9001", "alpha special mutation", {"status": 1})
        out = run(pipe, 'SEARCH t "alpha special" LIMIT 10')
        assert out.total == 1
        assert ctx.doc_store.primary_keys_batch(
            out.results.tolist()) == ["9001"]
        ctx.remove_row("9001")
        out = run(pipe, 'SEARCH t "alpha special" LIMIT 10')
        assert out.total == 0
