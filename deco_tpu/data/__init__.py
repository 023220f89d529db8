from deco_tpu.data import dpg, geneval, image_txt, imagenet, jsonl, loader, packed, randn
