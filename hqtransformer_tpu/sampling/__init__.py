from .engine import (SamplingParams, make_hierarchical_sampler,  # noqa: F401
                     make_igpt_sampler, make_multilevel_sampler,
                     make_txt2img_sampler)
