"""Execute the BERT triplet scorer with a tiny LOCAL BertForMaskedLM.

The reference only ever drives ``augment/bert.py`` from notebooks with the
downloaded ``bert-base-uncased``; in this zero-egress environment we build
a tiny randomly-initialized ``BertForMaskedLM`` from a local config +
vocab.txt (transformers is installed — nothing is fetched), zero the tied
output-embedding weight and plant a known decoder bias so mask logits are
deterministic, and exercise the full path: simple tokenizer, masking,
top-k, in-vocabulary filtering, plural stripping, and the triplet query
templating of ``/root/reference/augment/bert.py:93-123``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sgg_tpu.augment.bert import BERTScorer  # noqa: E402

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "man", "is", "riding", "horse", "horses", "dog", "cat",
         ",", ".", "##ing", "a", "on", "are", "men", "street"]
BIAS = {"horses": 9.0, "##ing": 8.0, "a": 7.0, "dog": 6.0, "cat": 5.0,
        "street": 4.0}


@pytest.fixture(scope="module")
def tiny_bert_dir(tmp_path_factory):
    from transformers import BertConfig, BertForMaskedLM

    d = tmp_path_factory.mktemp("tinybert")
    (d / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    config = BertConfig(vocab_size=len(VOCAB), hidden_size=32,
                        num_hidden_layers=2, num_attention_heads=2,
                        intermediate_size=64, max_position_embeddings=64)
    torch.manual_seed(0)
    model = BertForMaskedLM(config)
    # deterministic mask logits: zero the (tied) output projection so
    # logits == decoder bias at every position, then plant a known ranking
    with torch.no_grad():
        model.get_output_embeddings().weight.zero_()
        bias = model.cls.predictions.decoder.bias
        bias.zero_()
        for word, value in BIAS.items():
            bias[VOCAB.index(word)] = value
    model.save_pretrained(str(d))
    return str(d)


def test_predict_token_filters_and_strips_plurals(tiny_bert_dir):
    scorer = BERTScorer(model_name=tiny_bert_dir)
    # reference bert.py:26-61: top-k, drop wordpieces (##...), drop 1-char
    # tokens, restrict to classes, strip trailing 's' when the singular is
    # a known class
    pairs = scorer.predict_token("the man is riding the horse", 6,
                                 classes=["horse", "dog"], topk=2)
    assert pairs == [("horse", 9.0), ("dog", 6.0)]
    # without a class list every surviving token is kept: the wordpiece and
    # the 1-char token are still dropped
    pairs = scorer.predict_token("the man is riding the horse", 6,
                                 classes=None, topk=3)
    assert [p[0] for p in pairs] == ["horses", "dog", "cat"]


def test_score_word_reads_target_logit(tiny_bert_dir):
    scorer = BERTScorer(model_name=tiny_bert_dir)
    assert scorer.score_word("the man is riding the horse", 6,
                             "dog") == pytest.approx(6.0)
    assert scorer.score_word("the man is riding the horse", 6,
                             "cat") == pytest.approx(5.0)


def test_score_triplet_templating(tiny_bert_dir):
    """Masked-index arithmetic of bert.py:97-115: subject slot is token 2;
    object slot is 4 + len(predicate words) (+1 when an 'ing' predicate
    inserts a verb)."""
    scorer = BERTScorer(model_name=tiny_bert_dir)
    # "riding" contains 'ing' -> verb 'is';
    # query: [CLS] the man is riding the horse . [SEP]
    # subject: mask index 2 == 'man'; object: 4 + 1 + 1 = 6 == 'horse'
    s_subj = scorer.score_triplet("man", "riding", "horse", is_subject=True)
    s_obj = scorer.score_triplet("man", "riding", "horse", is_subject=False)
    # deterministic logits: every position's logits equal the planted bias
    assert s_subj == pytest.approx(0.0)   # bias['man'] == 0
    assert s_obj == pytest.approx(0.0)    # bias['horse'] == 0
    assert scorer.score_triplet("man", "riding", "dog",
                                is_subject=False) == pytest.approx(6.0)
    # non-'ing' predicate: no verb; object slot = 4 + len(['on']) = 5
    # query: [CLS] the dog on the cat . [SEP] -> token 5 == 'cat'
    assert scorer.score_triplet("dog", "on", "cat",
                                is_subject=False) == pytest.approx(5.0)
    # plural subject with 'ing' predicate uses 'are' (bert.py:110)
    assert scorer.score_triplet("men", "riding", "cat",
                                is_subject=False) == pytest.approx(5.0)


def test_context_string(tiny_bert_dir):
    """Context templating (bert.py:64-73): all other GT triplets appended
    as ', s_p_o' strings, underscores later flattened in the query."""
    scorer = BERTScorer(model_name=tiny_bert_dir,
                        obj_classes=["bg", "man", "horse", "dog"],
                        rel_classes=["bg", "riding", "on"])
    ctx = ", dog_on_horse"
    score = scorer.score_triplet("man", "riding", "horse", context=ctx,
                                 is_subject=False)
    assert score == pytest.approx(0.0)  # bias['horse'] == 0, index intact
