"""CLI entry points mirroring the reference scripts:

  python -m tpumil.cli.train_mil      <->  train_mil.py
  python -m tpumil.cli.train_wsi      <->  train_tcga.py
  python -m tpumil.cli.compute_feats  <->  compute_feats.py
  python -m tpumil.cli.tiler          <->  deepzoom_tiler.py
  python -m tpumil.cli.simclr_train   <->  simclr/run.py
  python -m tpumil.cli.attention_map  <->  attention_map.py
  python -m tpumil.cli.testing_tcga   <->  testing_tcga.py
  python -m tpumil.cli.testing_c16    <->  testing_c16.py
  python -m tpumil.cli.crop_single    <->  test_crop_single.py
  python -m tpumil.cli.download       <->  download.py

tpumil additions with no reference counterpart:

  python -m tpumil.cli.pipeline       — 5-stage end-to-end driver (YAML config)
  python -m tpumil.cli.slide_feats    — streaming slide->features (no JPEG round trip)
  python -m tpumil.cli.serve          — HTTP inference server (micro-batched embed/predict)
"""
