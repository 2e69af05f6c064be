"""searchgov_spider_ray — Ray-Data-native crawl-frontier + data-processing engine."""
__version__ = "0.1.0"
