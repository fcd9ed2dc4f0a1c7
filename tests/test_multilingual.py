"""Multilingual driver smoke: train (tiny Mistral) -> predict en/zh/fr."""

import json
import os
import pickle

import numpy as np

from zs_aac_tpu.train.predict_multilingual import tokenize_lang


def _mk_bank(path, n=24, e=512, seed=0, test=False):
    rng = np.random.default_rng(seed)
    words = ["dog", "cat", "rain", "wind", "bird", "car", "horn", "water"]
    recs = []
    for i in range(n):
        w = [words[int(x) % len(words)] for x in rng.integers(0, 8, 8)]
        cap = " ".join(w) + " sound."
        rec = {
            "audio_id": f"clip{i}",
            "text_embedding": rng.standard_normal((1, e)).astype(np.float32),
            "audio_embedding": rng.standard_normal((1, e)).astype(np.float32),
            "cn_caption": "狗在叫。",
            "fr_caption": "un chien aboie.",
        }
        if test:
            rec["caption"] = [{"caption": cap, "cn_caption": "狗在叫。",
                               "fr_caption": "un chien aboie."}]
        else:
            rec["caption"] = cap
        recs.append(rec)
    with open(path, "wb") as f:
        if test:
            pickle.dump(recs, f)
        else:
            for r in recs:
                pickle.dump(r, f)


def test_tokenize_lang():
    assert tokenize_lang("A Dog barks!", "en") == "a dog barks"
    assert tokenize_lang("狗在叫。", "zh") == "狗 在 叫"
    assert tokenize_lang("Un chien aboie, fort.", "fr") == "un chien aboie fort"


def test_multilingual_train_and_predict(tmp_path):
    train_bank = str(tmp_path / "train.pkl")
    test_bank = str(tmp_path / "test.pkl")
    _mk_bank(train_bank, n=16)
    _mk_bank(test_bank, n=2, seed=1, test=True)

    from zs_aac_tpu.train.train_prompt_multilingual import main as train_main

    out_dir = train_main([
        "--data", train_bank, "--valdata", test_bank,
        "--out_dir", str(tmp_path / "runs"),
        "--bs", "8", "--epochs", "1", "--warmup", "0",
        "--mistral_size", "tiny", "--prefix_length", "3",
        "--prefix_length_clip", "3", "--max_steps", "2",
        "--lora_r", "2", "--lora_alpha", "4",
    ])
    assert os.path.exists(os.path.join(out_dir, "best.pth"))
    saved = json.load(open(os.path.join(out_dir, "params.json")))
    assert saved["islang"] >= 1

    from zs_aac_tpu.train.predict_multilingual import main as predict_main

    preds = predict_main(["--test_dir", out_dir, "--data", test_bank, "--batch", "2"])
    assert set(preds.keys()) == {"en", "zh", "fr"}
    for lang in ("en", "zh", "fr"):
        assert os.path.exists(os.path.join(out_dir, f"scores_{lang}.txt"))
    out = json.load(open(os.path.join(out_dir, "output.txt")))
    assert "caption_zh" in out["predictions"][0]

    # the int8 serving path with the fused wqkv/gateup layout forced on
    # (--fuse_qkv on; 'auto' only fuses near the B=256 knee) produces the
    # same predictions as the float path would at these tiny scales is not
    # guaranteed — but the pipeline must run end-to-end and emit captions
    preds_f = predict_main(["--test_dir", out_dir, "--data", test_bank,
                            "--batch", "2", "--q8", "--fuse_qkv", "on",
                            "--langs", "en"])
    assert set(preds_f.keys()) == {"en"} and len(preds_f["en"]) == 2
