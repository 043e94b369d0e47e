from merlin_tpu.generate.decode import GenerateConfig, Generator
from merlin_tpu.generate.speculative import SpeculativeGenerator
