// WebSocket transport to /asr: binary PCM up, FrontData JSON down.
// Auto-reconnects with capped exponential backoff (mirrors the web client's
// behavior). An empty binary frame signals end-of-stream to the server.

import Foundation

struct TranscriptLine: Identifiable, Decodable {
    var id: String { "\(start)-\(speaker)" }
    let speaker: Int
    let text: String?
    let start: String
    let end: String
}

struct FrontData: Decodable {
    let status: String?
    let error: String?
    let lines: [TranscriptLine]?
    let buffer_transcription: String?
    let buffer_diarization: String?
    let remaining_time_transcription: Double?
}

final class SocketTransport: NSObject, URLSessionWebSocketDelegate {
    var onMessage: ((FrontData) -> Void)?
    var onStateChange: ((Bool) -> Void)?

    private var task: URLSessionWebSocketTask?
    private var session: URLSession!
    private var url: URL?
    private var backoff: TimeInterval = 1
    private var wantOpen = false

    override init() {
        super.init()
        session = URLSession(configuration: .default, delegate: self, delegateQueue: nil)
    }

    func connect(_ url: URL) {
        self.url = url
        wantOpen = true
        open()
    }

    private func open() {
        guard wantOpen, let url else { return }
        let task = session.webSocketTask(with: url)
        self.task = task
        task.resume()
        receiveLoop()
    }

    func sendPCM(_ data: Data) {
        task?.send(.data(data)) { [weak self] error in
            if error != nil { self?.scheduleReconnect() }
        }
    }

    func finish() {
        wantOpen = false
        task?.send(.data(Data())) { _ in }  // empty frame = end of stream
    }

    func close() {
        wantOpen = false
        task?.cancel(with: .normalClosure, reason: nil)
        task = nil
    }

    private func receiveLoop() {
        task?.receive { [weak self] result in
            guard let self else { return }
            switch result {
            case .failure:
                self.scheduleReconnect()
            case .success(let message):
                if case .string(let text) = message,
                   let data = text.data(using: .utf8),
                   let front = try? JSONDecoder().decode(FrontData.self, from: data) {
                    self.onMessage?(front)
                }
                self.receiveLoop()
            }
        }
    }

    private func scheduleReconnect() {
        onStateChange?(false)
        guard wantOpen else { return }
        let delay = backoff
        backoff = min(backoff * 2, 15)
        DispatchQueue.global().asyncAfter(deadline: .now() + delay) { [weak self] in
            self?.open()
        }
    }

    func urlSession(_ s: URLSession, webSocketTask: URLSessionWebSocketTask,
                    didOpenWithProtocol p: String?) {
        backoff = 1
        onStateChange?(true)
    }
}
