from merlin_tpu.generate.decode import GenerateConfig, Generator
