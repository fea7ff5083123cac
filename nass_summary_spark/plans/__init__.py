from nass_summary_spark.plans.queries import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
