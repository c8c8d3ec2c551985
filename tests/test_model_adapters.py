"""Model-adapter contract tests: the langid / perplexity stages must
accept any externally-trained model object (fastText / KenLM shaped)
through the batch interfaces, with tokenization and batching handled by
the adapter — pinned here with fake "external model" doubles whose
outputs encode the token lists they were fed.
"""

import pytest

from hooqu_spark.pipeline.langid import (
    DEFAULT_LANGID,
    LangIdModel,
    langid_scores,
    score_tokens,
)
from hooqu_spark.pipeline.perplexity import (
    DEFAULT_LM,
    PerplexityModel,
    doc_log_ppl,
    perplexity_scores,
)


def make_fake_langid():
    """Double that proves the adapter feeds PER-DOC token lists in
    order: prediction encodes the token count, score the first token's
    length.  Defined inside a function so cloudpickle ships the class
    BY VALUE to executors (test modules are not importable there) —
    the same pattern a notebook-defined real-model wrapper follows."""

    class FakeLangId(LangIdModel):
        def predict_tokens(self, docs_tokens):
            return [
                (f"n{len(toks)}", float(len(toks[0]) if toks else -1))
                for toks in docs_tokens
            ]

    return FakeLangId()


def make_fake_perplexity():
    class FakePerplexity(PerplexityModel):
        def log_ppl_tokens(self, docs_tokens):
            return [float(len(toks)) * 0.5 for toks in docs_tokens]

    return FakePerplexity()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "x"),
        (2, ""),
        (3, None),
        (4, "the be to of and a in that have it"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLangIdAdapter:
    def test_fake_model_receives_correct_tokens(self, docs):
        out = {
            r["doc_id"]: (r["lang_pred"], r["lang_score"])
            for r in langid_scores(docs, model=make_fake_langid()).collect()
        }
        assert out[0] == ("n3", 5.0)   # 3 tokens, first is "alpha"
        assert out[1] == ("n1", 1.0)
        assert out[2] == ("n0", -1.0)  # empty -> no tokens
        assert out[3] == ("n0", -1.0)  # NULL text treated as empty
        assert out[4] == ("n10", 3.0)

    def test_default_model_matches_scorer_spec(self, docs):
        out = {
            r["doc_id"]: (r["lang_pred"], r["lang_score"])
            for r in langid_scores(docs, model=DEFAULT_LANGID).collect()
        }
        for r in docs.collect():
            want = score_tokens((r["text"] or "").split())
            assert out[r["doc_id"]][0] == want[0]
            assert out[r["doc_id"]][1] == pytest.approx(want[1])
        assert out[4][0] == "en"  # pure stopword text is English

    def test_input_columns_preserved(self, docs):
        out = langid_scores(docs, model=make_fake_langid())
        assert out.columns == ["doc_id", "text", "lang_pred", "lang_score"]
        assert out.count() == docs.count()


class TestPerplexityAdapter:
    def test_fake_model_output_plumbed(self, docs):
        out = {
            r["doc_id"]: r["log_ppl"]
            for r in perplexity_scores(docs, model=make_fake_perplexity()).collect()
        }
        assert out == {0: 1.5, 1: 0.5, 2: 0.0, 3: 0.0, 4: 5.0}

    def test_default_model_matches_spec(self, docs):
        out = {
            r["doc_id"]: r["log_ppl"]
            for r in perplexity_scores(docs, model=DEFAULT_LM).collect()
        }
        for r in docs.collect():
            assert out[r["doc_id"]] == pytest.approx(
                doc_log_ppl((r["text"] or "").split())
            )
