from .logging import log_to_file, calculate_time_elapsed, SummaryLogger

__all__ = ["log_to_file", "calculate_time_elapsed", "SummaryLogger"]
