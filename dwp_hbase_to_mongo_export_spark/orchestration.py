"""Run orchestration: per-collection status tracking, completion fold,
downstream messaging payloads, metrics.

Reference: services/impl/DynamoDBExportStatusService.kt:33-121 (status
fold + increments), services/impl/SQSMessagingService.kt:20-99 and
SnsServiceImpl.kt:51-135 (message payload shapes),
batch/JobCompletionNotificationListener.kt:47-141 (terminal routing).

All driver-side: the heavy lifting happened in the DataFrame job; these
are bookkeeping calls after actions complete. External services (DynamoDB
/SQS/SNS via boto3, Prometheus pushgateway) are behind small interfaces
with in-memory defaults so the logic is testable hermetically; production
impls are thin boto3 adapters.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum


class CollectionStatus(str, Enum):
    EXPORTED = "Exported"
    EXPORT_FAILED = "Export_Failed"
    TABLE_UNAVAILABLE = "Table_Unavailable"
    BLOCKED_TOPIC = "Blocked_Topic"
    EXPORTING = "Exporting"


class ExportCompletionStatus(str, Enum):
    COMPLETED_SUCCESSFULLY = "COMPLETED_SUCCESSFULLY"
    IN_PROGRESS = "IN_PROGRESS"
    COMPLETED_UNSUCCESSFULLY = "COMPLETED_UNSUCCESSFULLY"
    NOT_COMPLETED = "NOT_COMPLETED"


_SUCCESSFUL = {CollectionStatus.EXPORTED, CollectionStatus.TABLE_UNAVAILABLE, CollectionStatus.BLOCKED_TOPIC}
_IN_PROGRESS = {CollectionStatus.EXPORTING}
_FAILED = {CollectionStatus.EXPORT_FAILED}


def completion_fold(statuses: list[CollectionStatus]) -> ExportCompletionStatus:
    """DynamoDBExportStatusService.exportCompletionStatus (kt:33-58):
    all-successful > any-in-progress > any-failed > not-completed."""
    if statuses and all(s in _SUCCESSFUL for s in statuses):
        return ExportCompletionStatus.COMPLETED_SUCCESSFULLY
    if any(s in _IN_PROGRESS for s in statuses):
        return ExportCompletionStatus.IN_PROGRESS
    if any(s in _FAILED for s in statuses):
        return ExportCompletionStatus.COMPLETED_UNSUCCESSFULLY
    return ExportCompletionStatus.NOT_COMPLETED


@dataclass
class ExportStatusService:
    """In-memory stand-in for the DynamoDB status table, keyed
    (correlation_id, collection). Production: boto3 update_item with
    'SET FilesExported = FilesExported + :x' (kt:60-73)."""

    correlation_id: str
    statuses: dict[str, CollectionStatus] = field(default_factory=dict)
    files_exported: dict[str, int] = field(default_factory=dict)

    def set_status(self, collection: str, status: CollectionStatus) -> None:
        self.statuses[collection] = status

    def increment_exported_count(self, collection: str, n: int = 1) -> None:
        self.files_exported[collection] = self.files_exported.get(collection, 0) + n

    def completion(self) -> ExportCompletionStatus:
        return completion_fold(list(self.statuses.values()))


def snapshot_sender_message(
    correlation_id: str, topic: str, object_key: str, bucket: str, *, files_exported: int
) -> str:
    """SQSMessagingService.notifySnapshotSender payload shape (kt:20-47)."""
    return json.dumps(
        {
            "shutdown_flag": "true",
            "correlation_id": correlation_id,
            "topic_name": topic,
            "export_date": "",
            "reprocess_files": "true",
            "s3_full_folder": object_key,
            "snapshot_type": "full",
            "files_exported_count": files_exported,
        },
        separators=(",", ":"),
    )


def adg_trigger_message(correlation_id: str, snapshot_type: str, export_date: str) -> str:
    """SQS data-egress / ADG trigger shape (SQSMessagingService.kt:49-74)."""
    return json.dumps(
        {
            "correlation_id": correlation_id,
            "s3_prefix": "",
            "snapshot_type": snapshot_type,
            "export_date": export_date,
        },
        separators=(",", ":"),
    )


@dataclass
class RunReport:
    """What JobCompletionNotificationListener.afterJob (kt:47-141) leaves
    behind: terminal status, file inventory, counters, message payloads."""

    topic: str
    status: CollectionStatus
    files: list = field(default_factory=list)  # per-file metadata Rows
    metrics: dict = field(default_factory=dict)
    messages: list[str] = field(default_factory=list)


def run_topic_export(
    cells,
    topic: str,
    sink_cfg,
    status_service: ExportStatusService,
    *,
    snapshot_type: str = "full",
    scan_time_range: tuple[int, int] | None = None,
    blocked_topics: tuple[str, ...] = (),
    bucket: str = "local",
) -> RunReport:
    """One topic end-to-end: pipeline -> encrypted snapshot + manifest
    sinks -> status increments -> terminal status -> message payloads.

    The §3.1 lifecycle as driver code around ONE DataFrame action: the
    sink write is the only job, and the read/valid/failed counters ride
    it via observe() (no second scan — at 100 TB a metrics-only pass
    would cost as much as the export). Blocked topics short-circuit
    before any job, exactly like the reference's pre-flight gate."""
    from .pipeline import BlockedTopicError, export_topic
    from .sinks.snapshot import write_encrypted_snapshots

    try:
        res = export_topic(
            cells,
            topic,
            snapshot_type=snapshot_type,
            scan_time_range=scan_time_range,
            blocked_topics=blocked_topics,
        )
    except BlockedTopicError:
        status_service.set_status(topic, CollectionStatus.BLOCKED_TOPIC)
        return RunReport(
            topic,
            CollectionStatus.BLOCKED_TOPIC,
            messages=[monitoring_message(status_service.correlation_id, status_service.completion(), snapshot_type)],
        )

    try:
        files = write_encrypted_snapshots(res.extra["sink_frame"], sink_cfg)
    except Exception:
        status_service.set_status(topic, CollectionStatus.EXPORT_FAILED)
        raise
    status_service.increment_exported_count(topic, len(files))
    status_service.set_status(topic, CollectionStatus.EXPORTED)

    obs = res.extra["observations"]
    metrics = {**obs["parsed"].get, **obs["normalised"].get}
    metrics["files_exported"] = len(files)

    messages = [
        snapshot_sender_message(
            status_service.correlation_id, topic, f.object_key, bucket, files_exported=len(files)
        )
        for f in files
    ]
    messages.append(adg_trigger_message(status_service.correlation_id, snapshot_type, ""))
    messages.append(
        monitoring_message(status_service.correlation_id, status_service.completion(), snapshot_type)
    )
    return RunReport(topic, CollectionStatus.EXPORTED, files=files, metrics=metrics, messages=messages)


def monitoring_message(correlation_id: str, status: ExportCompletionStatus, snapshot_type: str) -> str:
    """SNS monitoring payload (SnsServiceImpl.kt:51-95)."""
    severity = "Critical" if status == ExportCompletionStatus.COMPLETED_UNSUCCESSFULLY else "Information"
    return json.dumps(
        {
            "severity": severity,
            "notification_type": severity,
            "slack_username": "Crown Export Poller",
            "title_text": f"{snapshot_type} - Export finished - {status.value}",
            "custom_elements": [{"key": "Correlation Id", "value": correlation_id}],
        },
        separators=(",", ":"),
    )
