"""QA preparation on a miniature synthetic VQA-format JSON corpus."""

import json
import os

import numpy as np
import pytest

from vqa_attention_networks_tpu.data.prepare import (
    build_answer_vocab,
    build_soft_answers,
    load_qa_data,
    make_synthetic_qa_data,
    prepare_training_data,
    qa_artifact_path,
    save_qa_data,
)


def _mini_vqa_json(tmp_path, version=2):
    """Write a 2-split miniature corpus in the official VQA JSON schema."""
    vqa_dir = tmp_path / "vqa"
    os.makedirs(vqa_dir)

    def annotations(split, rows):
        return {
            "annotations": [
                {
                    "question_id": qid,
                    "image_id": img,
                    "multiple_choice_answer": ans,
                    "answer_type": atype,
                    "question_type": qtype,
                    "answers": [{"answer": a} for a in ten],
                }
                for qid, img, ans, atype, qtype, ten in rows
            ]
        }

    def questions(split, rows):
        return {
            "questions": [
                {"question_id": qid, "image_id": img, "question": q}
                for qid, img, q, *_ in rows
            ]
        }

    train_rows = [
        (1, 10, "What color is the cat?", None),
        (2, 11, "Is the dog sleeping?", None),
        (3, 10, "How many dogs are there?", None),
        (4, 12, "What color is the sky?", None),
        (7, 14, "Is the sky blue?", None),
    ]
    train_ann = [
        (1, 10, "black", "other", "what color is the",
         ["black"] * 7 + ["gray"] * 3),
        (2, 11, "yes", "yes/no", "is the", ["yes"] * 10),
        (3, 10, "two", "number", "how many", ["two"] * 6 + ["three"] * 4),
        (4, 12, "blue", "other", "what color is the",
         ["blue"] * 9 + ["rainbowish"] * 1),
        (7, 14, "no", "yes/no", "is the", ["no"] * 10),
    ]
    val_rows = [
        (5, 13, "Is the cat black?", None),
        (6, 13, "What color is the dog?", None),
    ]
    val_ann = [
        (5, 13, "yes", "yes/no", "is the", ["yes"] * 8 + ["no"] * 2),
        (6, 13, "black", "other", "what color is the",
         ["black"] * 5 + ["brown"] * 5),
    ]

    for split, q_rows, a_rows in (("train", train_rows, train_ann),
                                  ("val", val_rows, val_ann)):
        q_name = f"v2_OpenEnded_mscoco_{split}2014_questions.json"
        a_name = f"v2_mscoco_{split}2014_annotations.json"
        with open(vqa_dir / q_name, "w") as f:
            json.dump(questions(split, q_rows), f)
        with open(vqa_dir / a_name, "w") as f:
            json.dump(annotations(split, a_rows), f)
    return str(tmp_path)


def test_answer_vocab_top_n_plus_unk():
    anns = [{"multiple_choice_answer": a} for a in
            ["yes", "yes", "yes", "no", "no", "Three", "blue"]]
    vocab = build_answer_vocab(anns, num_ans=3)
    # top-2 by frequency + UNK at index 2; "Three" normalises to "3"
    assert vocab == {"yes": 0, "no": 1, "UNK": 2}


def test_soft_answers_renormalise_over_in_vocab():
    vocab = {"yes": 0, "no": 1, "UNK": 2}
    anns = [{
        "question_id": 7,
        "answers": [{"answer": "yes"}] * 6 + [{"answer": "no"}] * 2
        + [{"answer": "maybe"}] * 2,  # OOV, dropped
    }]
    soft, counts = build_soft_answers(vocab, anns)
    assert soft[7] == {0: 6 / 8, 1: 2 / 8}
    assert counts[7] == 8  # in-vocab annotators (the soft denominator)


def test_prepare_roundtrip(tmp_path):
    data_dir = _mini_vqa_json(tmp_path)
    data = prepare_training_data(data_dir=data_dir, version=2, num_ans=5)

    # 5 distinct answers, num_ans=5: the reference keeps top_n-1 = 4 answers
    # + UNK (utils.py:239-247), displacing the least-frequent ("two"), whose
    # question is then dropped (utils.py:181-182) -> 4 of 5 train rows survive
    assert len(data.train) == 4 and len(data.val) == 2
    assert data.a_vocab_size == 5
    assert "two" not in data.answer_vocab
    # pad id 0 is reserved; every real token id is within the embedding range
    assert data.train.questions.min() >= 0
    assert data.train.questions.max() < data.q_vocab_size
    assert data.question_vocab["UNK"] == data.q_vocab_size - 1

    # soft answers sum to 1 where annotators hit the vocab
    dense = data.train.soft_dense(data.a_vocab_size)
    sums = dense.sum(axis=1)
    assert np.all((np.abs(sums - 1.0) < 1e-6) | (sums == 0.0))

    # per-question answer-type codes (0=yes/no, 1=number, 2=other): "two"
    # normalises to "2" and the string tie-break keeps it, so the displaced
    # answer is "no" and the survivors are black/other, yes/yes-no,
    # two/number, blue/other
    np.testing.assert_array_equal(data.train.answer_types, [2, 0, 1, 2])
    np.testing.assert_array_equal(data.val.answer_types, [0, 2])
    # question ids survive encoding (the submission-export key)
    np.testing.assert_array_equal(data.train.question_ids, [1, 2, 3, 4])
    np.testing.assert_array_equal(data.val.question_ids, [5, 6])
    # question-type table is sorted-deterministic and codes match it
    assert data.question_type_names == [
        "how many", "is the", "what color is the"
    ]
    np.testing.assert_array_equal(data.train.question_types, [2, 1, 0, 2])
    np.testing.assert_array_equal(data.val.question_types, [1, 2])

    # reload from disk == in-memory
    loaded = load_qa_data(qa_artifact_path(data_dir, 2, 5))
    np.testing.assert_array_equal(loaded.train.questions, data.train.questions)
    np.testing.assert_array_equal(loaded.val.answers, data.val.answers)
    np.testing.assert_array_equal(loaded.train.answer_types,
                                  data.train.answer_types)
    np.testing.assert_array_equal(loaded.val.answer_types,
                                  data.val.answer_types)
    np.testing.assert_array_equal(loaded.val.question_ids,
                                  data.val.question_ids)
    np.testing.assert_array_equal(loaded.val.question_types,
                                  data.val.question_types)
    assert loaded.question_type_names == data.question_type_names
    assert loaded.answer_vocab == data.answer_vocab


def test_answer_type_filter(tmp_path):
    data_dir = _mini_vqa_json(tmp_path)
    data = prepare_training_data(
        data_dir=data_dir, version=2, num_ans=5, answer_type="yes/no"
    )
    # only the yes/no questions are considered (2 train + 1 val); with two
    # distinct answers top_n = min(num_ans, 2) = 2, so UNK displaces "no"
    # (reference utils.py:239-247) and the "no" question is dropped
    assert len(data.train) == 1 and len(data.val) == 1
    assert "yes" in data.answer_vocab
    assert "no" not in data.answer_vocab
    assert data.a_vocab_size == 2


def test_synthetic_qa_data_contract():
    data = make_synthetic_qa_data(np.random.default_rng(0), n_train=32, n_val=8)
    assert data.train.questions.shape == (32, 22)
    assert data.q_vocab_size == 52  # 50 words + pad + UNK
    dense = data.train.soft_dense(data.a_vocab_size)
    assert dense.shape == (32, 16)
    assert (dense.sum(1) > 0).all()


def test_save_load_synthetic(tmp_path):
    data = make_synthetic_qa_data(np.random.default_rng(1), n_train=8, n_val=4)
    base = str(tmp_path / "qa_test")
    save_qa_data(data, base)
    loaded = load_qa_data(base)
    np.testing.assert_array_equal(loaded.train.soft_idx, data.train.soft_idx)
    assert loaded.max_question_length == data.max_question_length
