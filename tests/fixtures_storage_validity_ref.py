"""Reference fixture ported VERBATIM (values only) from
`/root/reference/src/storage_validity_by_grand_product/test_input.rs:12-1064`
(generate_test_input_unsorted / generate_test_input_sorted): the realistic
16-query storage access log + its prover-sorted counterpart with cycle
positions (the TimestampedStorageLogRecord wrapper timestamps).
"""

UNSORTED = [
    {'address': 32770, 'key': 32779, 'read_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'written_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 1205, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32779, 'key': 1, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 1425, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32770, 'key': 32779, 'read_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'written_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 1609, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32779, 'key': 7, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 1777, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32770, 'key': 32779, 'read_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'written_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 1969, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32779, 'key': 5, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 2253, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 10, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 2357, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32770, 'key': 32779, 'read_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'written_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 2429, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32779, 'key': 4, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 2681, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 9, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 2797, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 9, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 2829, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32770, 'key': 32779, 'read_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'written_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 2901, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32779, 'key': 3, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 3089, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 8, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 3193, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32770, 'key': 32779, 'read_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'written_value': 452319300877325313852488925888724764263521004047156906617735320131041551860, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 3265, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32779, 'key': 2, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 3421, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
]

SORTED = [
    {'address': 32769, 'key': 2, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 4785, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 2, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 4817, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 3, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 4317, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 4, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 4721, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 4, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 4753, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 5, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 5177, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 6, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 3929, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 7, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 3525, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 8, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 3193, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 9, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 2797, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 9, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 2829, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 10, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 2357, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 11, 'read_value': 0, 'written_value': 0, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 5197, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 12, 'read_value': 0, 'written_value': 0, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 7093, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 12, 'read_value': 0, 'written_value': 1, 'rw_flag': True, 'rollback': False, 'is_service': False, 'timestamp': 7129, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
    {'address': 32769, 'key': 13, 'read_value': 1, 'written_value': 1, 'rw_flag': False, 'rollback': False, 'is_service': False, 'timestamp': 7177, 'aux_byte': 0, 'shard_id': 0, 'tx_number_in_block': 0},
]

POSITIONS = [27, 28, 22, 25, 26, 31, 19, 16, 13, 9, 10, 6, 32, 35, 36, 38]
