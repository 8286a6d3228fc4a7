from freefine_tpu.data.geobench import GeoBenchDataset, load_json, save_json  # noqa: F401
