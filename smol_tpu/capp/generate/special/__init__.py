"""Special structure generation (SQS, ...)."""

from smol_tpu.capp.generate.special.sqs import SQS, SQSGenerator, StochasticSQSGenerator

__all__ = ["SQS", "SQSGenerator", "StochasticSQSGenerator"]
