"""lstm_ctc_ocr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) CRNN-CTC OCR framework.

A from-scratch rebuild of the capabilities of ilovin/lstm_ctc_ocr
(reference at /root/reference): synthetic captcha generation, a
CNN + bidirectional-LSTM + CTC recognition model, training/eval drivers,
checkpointing, and CTC decoding — all re-designed TPU-first:

* the model is a pure function over a parameter pytree, jit-compiled once
  per width bucket (static shapes — no dynamic padding inside XLA);
* the CTC forward-backward is a from-scratch kernel (pure-JAX scan and a
  Pallas TPU kernel, selectable via ``cfg.CTC_IMPL``) with a custom VJP,
  conformance-tested against a C++ reference implementation
  (``native/ctc_ref.cpp``) and TF's ``tf.nn.ctc_loss``;
* the BiLSTM is a time-axis scan (pure-JAX and fused Pallas variants,
  ``cfg.LSTM_IMPL``);
* data parallelism is ``jax.sharding.Mesh`` + jit shardings over ICI,
  not host process replication.

Public surface mirrors the reference so users can switch directly:
``config.cfg`` / ``cfg_from_file`` / ``cfg_from_list``, the
``models.factory.get_network`` name dispatch, ``engine.train.train_net``
and ``engine.test.test_net`` drivers, and the ``lstm/train_net.py`` /
``lstm/test_net.py`` CLI entry points driven by ``train.sh`` / ``test.sh``.
"""

__version__ = "0.1.0"
