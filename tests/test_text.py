"""Golden tests for text normalisation / tokenisation (reference utils.py:60-109)."""

from vqa_attention_networks_tpu.data.text import (
    encode_question,
    normalize_answer,
    normalize_words,
    tokenize,
)


def test_contractions_and_numbers():
    assert normalize_words(["dont", "CANT", "wont"]) == ["don't", "can't", "won't"]
    assert normalize_words(["Two", "ten", "zero", "none"]) == ["2", "10", "0", "0"]
    # chained: lowercase -> contraction -> number map; plain words untouched
    assert normalize_words(["Dog"]) == ["dog"]


def test_capitalised_table_keys_unreachable():
    # The reference lowercases before lookup, so "Im" (a table key) never hits;
    # the lowercased "im" isn't in the table either (utils.py:96-109).
    assert normalize_words(["Im"]) == ["im"]


def test_reversed_vqa_eval_quirk():
    # upstream VQA-eval table maps somebody'd -> somebodyd (utils.py:69)
    assert normalize_words(["somebody'd"]) == ["somebodyd"]


def test_answer_normalisation():
    assert normalize_answer("Yes") == "yes"
    assert normalize_answer("Three") == "3"


def test_tokenize_regex():
    # \w+ tokenisation: punctuation splits, apostrophes split words
    assert tokenize("What's the dog doing?") == ["what", "s", "the", "dog", "doing"]
    assert tokenize("Is this 2 cats?") == ["is", "this", "2", "cats"]


def test_encode_left_and_right_aligned():
    vocab = {"what": 1, "is": 2, "this": 3, "UNK": 4}
    left = encode_question("What is this zebra?", vocab, max_len=6)
    assert left == [1, 2, 3, 4, 0, 0]
    right = encode_question("What is this zebra?", vocab, max_len=6, right_align=True)
    assert right == [0, 0, 1, 2, 3, 4]
