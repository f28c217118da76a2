from .constraints import Constraint, ConstraintSuite, DataQualityError

__all__ = ["Constraint", "ConstraintSuite", "DataQualityError"]
