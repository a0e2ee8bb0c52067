#!/usr/bin/env python
"""Checkpoint-export CLI: selavi-tpu checkpoint.msgpack -> the reference's
PyTorch .pth.tar layout (inverse of the torch importer; an extra beyond the
reference, which has no cross-framework tools)."""
from selavi_tpu.train.torch_export import main

if __name__ == "__main__":
    main()
