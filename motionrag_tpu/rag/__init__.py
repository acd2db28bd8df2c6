from motionrag_tpu.rag.database import RAGDatabase
from motionrag_tpu.rag.index import DeviceIndex, VectorStore
from motionrag_tpu.rag.build import build_database

__all__ = ["RAGDatabase", "DeviceIndex", "VectorStore", "build_database"]
