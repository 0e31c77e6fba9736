"""Structured Streaming ingestion: the Spark re-expression of the
reference's streaming stores (Kinesis AWSKinesisEventStore, Kafka
KafkaEventStore) and push subscriptions (EventStream SPI).
"""

from .job import StreamingIngest
from .subscriptions import StreamSubscription, SubscriptionRegistry
from .windows import StatefulSessionizer, attributed_purchases, windowed_counts

__all__ = [
    "StreamingIngest",
    "StreamSubscription",
    "SubscriptionRegistry",
    "StatefulSessionizer",
    "attributed_purchases",
    "windowed_counts",
]
