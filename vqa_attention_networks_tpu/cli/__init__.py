"""CLI entry points (the reference's public interface, SURVEY.md section 1):

    python -m vqa_attention_networks_tpu.cli.prepare_data      (utils.py __main__)
    python -m vqa_attention_networks_tpu.cli.extract_features  (extract_image_features.py)
    python -m vqa_attention_networks_tpu.cli.train             (train_models.py)
    python -m vqa_attention_networks_tpu.cli.evaluate          (train_models.py --mode testing / evaluate_tf.py)
    python -m vqa_attention_networks_tpu.cli.predict           (predict_pytorch.py)
"""
