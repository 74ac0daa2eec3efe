"""Pydantic schemas for the web API.

Mirrors the reference's 11 response/request models
(``/root/reference/src/web/schemas.py:14-96``)."""

from __future__ import annotations

from typing import Dict, List, Optional

from pydantic import BaseModel, Field


class GameState(BaseModel):
    board: List[List[int]]
    current_player: int
    legal_moves: List[int]
    black_count: int
    white_count: int
    move_count: int
    is_game_over: bool
    winner: Optional[int] = None
    last_move: Optional[int] = None
    last_ai_move: Optional[int] = None
    is_ai_thinking: bool = False
    model_loaded: bool = False
    model_path: Optional[str] = None
    ai_simulations: int = 100
    can_undo: bool = False
    board_size: int = 8


class MoveRequest(BaseModel):
    position: int = Field(ge=0)


class MoveResponse(BaseModel):
    success: bool
    error: Optional[str] = None
    state: Optional[GameState] = None


class SimpleResponse(BaseModel):
    success: bool
    error: Optional[str] = None


class AiStatusResponse(BaseModel):
    is_thinking: bool
    last_ai_move: Optional[int] = None
    error: Optional[str] = None


class HintResponse(BaseModel):
    evaluations: Dict[int, int]
    num_simulations: int


class LoadModelRequest(BaseModel):
    path: str


class SimulationsRequest(BaseModel):
    num_simulations: int


class SimulationsResponse(BaseModel):
    num_simulations: int


class ModelListResponse(BaseModel):
    models: List[str]
    current: Optional[str] = None


class ErrorResponse(BaseModel):
    detail: str
