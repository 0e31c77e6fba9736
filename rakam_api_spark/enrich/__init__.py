"""Enrichment pipeline: the Spark re-expression of the reference's
EventMapper chain (rakam-spi/.../plugin/EventMapper.java; pipeline
driver EventCollectionHttpService.mapEvent:123-151).

Each mapper is a pure DataFrame→DataFrame column transform plus a
field-dependency declaration (constant fields always added,
dependent fields added when their trigger column appears —
FieldDependencyBuilder, rakam-spi/.../collection/
FieldDependencyBuilder.java:12-53).  All mappers are row-local ⇒
embarrassingly parallel; dimension lookups (GeoIP ranges, UA
regexes) are broadcast joins.
"""

from .pipeline import EnrichmentPipeline, Mapper
from .timestamp import TimestampMapper
from .geoip import GeoIPMapper
from .useragent import UserAgentMapper
from .referrer import ReferrerMapper
from .userid import UserIdMapper

__all__ = [
    "EnrichmentPipeline",
    "Mapper",
    "TimestampMapper",
    "GeoIPMapper",
    "UserAgentMapper",
    "ReferrerMapper",
    "UserIdMapper",
]
