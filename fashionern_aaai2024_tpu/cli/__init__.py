from fashionern_aaai2024_tpu.cli.main import main
